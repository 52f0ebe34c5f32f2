"""Docs' python snippets must at least be valid syntax
(reference e2e/test_doc_examples.py runs them with real weights; offline we
compile-check every fenced python block)."""

import ast
import re
from pathlib import Path

import pytest

DOCS = sorted(Path(__file__).parent.parent.glob("docs/*.md")) + [Path(__file__).parent.parent / "README.md"]


@pytest.mark.parametrize("doc", DOCS, ids=lambda p: p.name)
def test_doc_python_snippets_compile(doc: Path) -> None:
    text = doc.read_text()
    blocks = re.findall(r"```(?:py|python)\n(.*?)```", text, flags=re.DOTALL)
    assert blocks or "```py" not in text
    for i, block in enumerate(blocks):
        try:
            ast.parse(block)
        except SyntaxError as e:
            raise AssertionError(f"{doc.name} python block #{i} has a syntax error: {e}\n{block}") from None


def test_doc_symbol_references_exist() -> None:
    """Every `refiners_tpu.*` import in docs must resolve."""
    import importlib

    pattern = re.compile(r"^from (refiners_tpu[\w.]*) import ([\w, ]+)$", re.MULTILINE)
    for doc in DOCS:
        for module_name, names in pattern.findall(doc.read_text()):
            module = importlib.import_module(module_name)
            for name in (n.strip() for n in names.split(",")):
                assert hasattr(module, name), f"{doc.name}: {module_name}.{name} does not exist"
