"""Docs' python snippets: compile-check everything, EXECUTE the offline ones.

The reference golden-tests its docs by running every guide with real weights
(/root/reference/tests/e2e/test_doc_examples.py). Offline we split the same
guarantee in two:

- every fenced python block in every docs page must parse, and every
  `refiners_tpu` import in docs must resolve (all pages);
- pages whose snippets are designed to run without downloaded weights
  (concept pages, the Training-101 toy example) are executed top-to-bottom
  in one shared namespace per page, like a literate program.
"""

import ast
import re
from pathlib import Path

import pytest

DOCS_DIR = Path(__file__).parent.parent / "docs"
DOCS = sorted(DOCS_DIR.rglob("*.md")) + [Path(__file__).parent.parent / "README.md"]

# pages whose snippet sequence is runnable offline, top to bottom
RUNNABLE = [
    "concepts/chain.md",
    "concepts/context.md",
    "concepts/adapter.md",
]


def _blocks(doc: Path) -> list[str]:
    return re.findall(r"```(?:py|python)\n(.*?)```", doc.read_text(), flags=re.DOTALL)


@pytest.mark.parametrize("doc", DOCS, ids=lambda p: str(p.relative_to(p.parent.parent)))
def test_doc_python_snippets_compile(doc: Path) -> None:
    text = doc.read_text()
    blocks = _blocks(doc)
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


@pytest.mark.parametrize("rel", RUNNABLE)
def test_doc_page_executes(rel: str) -> None:
    """Run the page's snippets in order, one namespace, like a reader would."""
    page = DOCS_DIR / rel
    namespace: dict = {}
    for i, block in enumerate(_blocks(page)):
        try:
            exec(compile(block, f"{rel}#block{i}", "exec"), namespace)
        except Exception as e:
            raise AssertionError(f"{rel} block #{i} failed: {type(e).__name__}: {e}\n{block}") from e


@pytest.mark.slow
def test_training_101_toy_example_trains() -> None:
    """The guide's complete autoencoder example must actually train: loss at
    the end below loss at the start (golden behavior, no weights needed)."""
    page = DOCS_DIR / "guides/training_101.md"
    blocks = _blocks(page)
    # the "complete example" is the first block; instrument it via a callback
    src = blocks[0]
    assert "trainer.train()" in src
    namespace: dict = {}
    probe_src = src.replace(
        "trainer.train()",
        "losses = []\n"
        "_orig = trainer.step\n"
        "def _probe(batch):\n"
        "    _orig(batch)\n"
        "    losses.append(float(trainer.loss))\n"
        "trainer.step = _probe\n"
        "trainer.train()",
    )
    exec(compile(probe_src, "training_101#example", "exec"), namespace)
    losses = namespace["losses"]
    assert len(losses) >= 100
    first, last = sum(losses[:10]) / 10, sum(losses[-10:]) / 10
    assert last < first * 0.9, f"toy training did not converge: {first:.4f} -> {last:.4f}"
