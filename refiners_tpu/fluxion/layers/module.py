"""Module base classes: pytree-registered, surgery-friendly, jit-transparent.

Reference semantics: /root/reference/src/refiners/fluxion/layers/module.py
(Module :23, ContextModule :153, WeightedModule :238, ModuleTree :267).

TPU-native design
-----------------
Instead of wrapping ``torch.nn.Module``, every :class:`Module` subclass is
automatically registered as a JAX **pytree node**: attributes holding
``jax.Array``s (or containers of arrays / sub-modules) are dynamic leaves, and
everything else is static aux data. Consequences:

* A whole model can be passed as an argument to ``jax.jit`` — weights travel
  as pytree leaves, so nothing is baked into the compiled executable.
* Graph surgery (``Chain.replace``, ``Adapter.inject`` …) is plain Python
  object mutation *before* tracing; a structural change produces a different
  treedef, which naturally triggers recompilation — the XLA graph always
  matches the current Python tree.
* ``structural_copy`` can share weight leaves between copies: duplicated
  leaves flatten to the same buffer, costing no extra HBM.

Parent pointers are kept out of the pytree (they are cyclic) and re-linked by
``Chain`` after unflattening.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Callable, Iterator, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from refiners_tpu.fluxion.context import ContextProvider

T = TypeVar("T", bound="Module")

_ARRAY_TYPES = (jax.Array, np.ndarray)

BasicType = str | float | int | bool


def _contains_dynamic(value: Any) -> bool:
    """True if `value` is (or contains) an array or a Module."""
    if isinstance(value, _ARRAY_TYPES) or isinstance(value, Module):
        return True
    if isinstance(value, dict):
        return any(_contains_dynamic(v) for v in value.values())
    if isinstance(value, (list, tuple)):
        return any(_contains_dynamic(v) for v in value)
    return False


class _Static:
    """Hashable wrapper for static aux data (jit cache key component)."""

    __slots__ = ("value",)

    def __init__(self, value: Any) -> None:
        self.value = value

    def __eq__(self, other: Any) -> bool:
        return type(other) is _Static and self.value == other.value

    def __hash__(self) -> int:
        try:
            return hash(self.value)
        except TypeError:
            return hash(repr(self.value))

    def __repr__(self) -> str:
        return f"_Static({self.value!r})"


class Module:
    """Base class for all layers; automatically a JAX pytree node."""

    # attributes never included in the pytree (cyclic or transient)
    _pytree_ignore: frozenset[str] = frozenset({"_parent", "_can_refresh_parent"})

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        pass

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        _register_module_pytree(cls)

    # -- pytree protocol ----------------------------------------------------

    def _tree_flatten_with_keys(self):
        # NOTE: dynamic dict attributes (e.g. Chain._modules) are flattened as
        # ordered lists with their keys in aux — jax's native dict flattening
        # SORTS keys, which would scramble Chain execution order under jit.
        dyn_keys: list[str] = []
        dyn_vals: list[Any] = []
        dict_keys: list[tuple[str, tuple[str, ...]]] = []
        static: list[tuple[str, Any]] = []
        for k, v in self.__dict__.items():
            if k in self._pytree_ignore:
                continue
            if _contains_dynamic(v):
                dyn_keys.append(k)
                if isinstance(v, dict):
                    dict_keys.append((k, tuple(v.keys())))
                    dyn_vals.append(list(v.values()))
                else:
                    dyn_vals.append(v)
            else:
                static.append((k, _Static(v)))
        aux = (tuple(dyn_keys), tuple(static), tuple(dict_keys))
        keyed = [(jax.tree_util.GetAttrKey(k), v) for k, v in zip(dyn_keys, dyn_vals)]
        return keyed, aux

    def _tree_flatten(self):
        keyed, aux = self._tree_flatten_with_keys()
        return [v for _, v in keyed], aux

    @classmethod
    def _tree_unflatten(cls, aux: Any, children: Sequence[Any]) -> "Module":
        dyn_keys, static, dict_keys = aux
        dict_key_map = dict(dict_keys)
        obj = object.__new__(cls)
        for k, wrapped in static:
            object.__setattr__(obj, k, wrapped.value)
        for k, v in zip(dyn_keys, children):
            if k in dict_key_map:
                v = dict(zip(dict_key_map[k], v))
            object.__setattr__(obj, k, v)
        obj._post_unflatten()
        return obj

    def _post_unflatten(self) -> None:
        """Hook: restore transient state after pytree unflattening."""

    # -- call protocol ------------------------------------------------------

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self.forward(*args, **kwargs)

    def forward(self, *args: Any, **kwargs: Any) -> Any:
        raise NotImplementedError(f"{self.__class__.__name__} does not implement forward")

    # -- arrays / dtype -----------------------------------------------------

    def arrays(self) -> Iterator[tuple[str, jax.Array]]:
        """Yield (dotted-path, array) for every array leaf.

        Chain children appear under their unique names (reference state-dict
        layout, e.g. ``Sum.TokenEncoder.weight``) — the internal ``_modules``
        container does not appear in paths.
        """
        for k, v in self.__dict__.items():
            if k in self._pytree_ignore:
                continue
            if k == "_modules" and isinstance(v, dict):
                for name, child in v.items():
                    yield from _walk_arrays(name, child)
            else:
                yield from _walk_arrays(k, v)

    def state_dict(self) -> dict[str, jax.Array]:
        return dict(self.arrays())

    def load_state_dict(self, state: dict[str, Any], strict: bool = True) -> None:
        own = self.state_dict()
        missing = [k for k in own if k not in state]
        unexpected = [k for k in state if k not in own]
        if strict and (missing or unexpected):
            raise KeyError(
                f"state mismatch for {self.__class__.__name__}: missing={missing[:8]}"
                f"{'...' if len(missing) > 8 else ''} unexpected={unexpected[:8]}"
                f"{'...' if len(unexpected) > 8 else ''}"
            )
        for key, value in state.items():
            if key not in own:
                continue
            expected = own[key]
            value = jnp.asarray(value)
            if value.shape != expected.shape:
                raise ValueError(f"shape mismatch for {key}: {value.shape} vs {expected.shape}")
            self._set_array_by_path(key, value.astype(expected.dtype))

    def _set_array_by_path(self, path: str, value: jax.Array) -> None:
        parts = path.split(".")
        obj: Any = self
        for part in parts[:-1]:
            if isinstance(obj, Module) and hasattr(obj, "_modules") and part in obj._modules:  # type: ignore[attr-defined]
                obj = obj._modules[part]  # type: ignore[attr-defined]
            elif isinstance(obj, dict):
                obj = obj[part]
            else:
                obj = getattr(obj, part)
        last = parts[-1]
        if isinstance(obj, dict):
            obj[last] = value
        else:
            setattr(obj, last, value)

    def to(self: T, dtype: jnp.dtype | None = None) -> T:
        """In-place dtype cast of all floating-point array leaves; returns self."""
        if dtype is not None:
            def cast(path: str, x: jax.Array) -> jax.Array:
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x.astype(dtype)
                return x

            self.map_arrays(cast)
        return self

    def map_arrays(self, fn: Callable[[str, jax.Array], jax.Array]) -> None:
        for path, arr in list(self.arrays()):
            self._set_array_by_path(path, fn(path, arr))

    @property
    def dtype(self) -> jnp.dtype | None:
        for _, arr in self.arrays():
            if jnp.issubdtype(arr.dtype, jnp.floating):
                return arr.dtype
        return None

    def param_count(self) -> int:
        return sum(int(np.prod(a.shape)) for _, a in self.arrays())

    # -- safetensors --------------------------------------------------------

    def load_from_safetensors(self: T, path: Any, strict: bool = True) -> T:
        """Load weights from a safetensors file (reference module.py:45)."""
        from refiners_tpu.fluxion.utils import load_from_safetensors

        self.load_state_dict(load_from_safetensors(path), strict=strict)
        return self

    # -- introspection ------------------------------------------------------

    def named_modules(self, prefix: str = "") -> Iterator[tuple[str, "Module"]]:
        yield prefix, self

    def basic_attributes(self, init_attrs_only: bool = False) -> dict[str, Any]:
        """Return basic (str/int/float/bool) attributes for repr (module.py:101)."""
        import inspect

        sig = inspect.signature(self.__class__.__init__)
        init_params = set(sig.parameters.keys()) if init_attrs_only else None
        # attributes equal to their constructor default are omitted from repr
        defaults = {
            k: p.default for k, p in sig.parameters.items() if p.default is not inspect.Parameter.empty
        }

        def is_basic(v: Any) -> bool:
            if isinstance(v, BasicType):  # type: ignore[arg-type]
                return True
            if isinstance(v, (tuple, list)) and all(is_basic(x) for x in v):
                return True
            return False

        out: dict[str, Any] = {}
        for k, v in self.__dict__.items():
            if k.startswith("_"):
                continue
            if not is_basic(v):
                continue
            if init_params is not None and (k not in init_params or v == defaults.get(k)):
                continue
            out[k] = v
        return out

    def pretty_print(self, depth: int = -1) -> None:
        print(self._tree_repr(depth=depth))

    def _tree_repr(self, depth: int = -1) -> str:
        return ModuleTree(module=self).generate(depth=depth)

    def __repr__(self) -> str:
        attrs = ", ".join(f"{k}={v}" for k, v in self.basic_attributes(init_attrs_only=True).items())
        return f"{self.__class__.__name__}({attrs})"

    def get_path(self, parent: "Chain | None" = None, top: "Module | None" = None) -> str:
        """Dotted path of this module in the tree (module.py:137)."""
        p = parent if parent is not None else getattr(self, "parent", None)
        if p is None or self == top:
            return self.__class__.__name__
        for name, mod in p._modules.items():  # type: ignore[attr-defined]
            if mod is self:
                return f"{p.get_path(top=top)}.{name}"
        raise ValueError(f"{self} not found in {p}")


def _walk_arrays(prefix: str, value: Any) -> Iterator[tuple[str, jax.Array]]:
    if isinstance(value, _ARRAY_TYPES):
        yield prefix, value  # type: ignore[misc]
    elif isinstance(value, Module):
        for sub, arr in value.arrays():
            yield f"{prefix}.{sub}", arr
    elif isinstance(value, dict):
        for k, v in value.items():
            yield from _walk_arrays(f"{prefix}.{k}", v)
    elif isinstance(value, (list, tuple)):
        for i, v in enumerate(value):
            yield from _walk_arrays(f"{prefix}.{i}", v)


def _register_module_pytree(cls: type) -> None:
    jax.tree_util.register_pytree_with_keys(
        cls,
        flatten_with_keys=lambda m: m._tree_flatten_with_keys(),
        unflatten_func=cls._tree_unflatten,
        flatten_func=lambda m: m._tree_flatten(),
    )


_register_module_pytree(Module)


class ContextModule(Module):
    """Module with a parent pointer and access to the root ContextProvider.

    Reference: module.py:153 — parent stored in a 1-element list there to
    dodge torch registration; here it is simply excluded from the pytree.
    """

    _parent: "list[Chain]"
    _can_refresh_parent: bool

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self._parent = []
        self._can_refresh_parent = True

    def _post_unflatten(self) -> None:
        self._parent = []
        self._can_refresh_parent = True

    @property
    def parent(self) -> "Chain | None":
        return self._parent[0] if self._parent else None

    @property
    def ensure_parent(self) -> "Chain":
        assert self._parent, "module is not bound to a Chain"
        return self._parent[0]

    def _set_parent(self, parent: "Chain | None") -> None:
        if not self._can_refresh_parent:
            return
        if parent is None:
            self._parent = []
            return
        # check that parent owns self
        assert any(m is self for m in parent), "could not find module in parent"
        self._parent = [parent]

    @property
    def provider(self) -> "ContextProvider":
        return self.ensure_parent.provider

    def get_parents(self) -> "list[Chain]":
        return [self.parent, *self.parent.get_parents()] if self.parent else []

    def no_parent_refresh(self):
        """Context manager freezing the parent pointer — used by `setup_adapter`
        so wrapping a target in an adapter chain does not steal its parent."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            self._can_refresh_parent = False
            try:
                yield
            finally:
                self._can_refresh_parent = True

        return _ctx()

    def use_context(self, context_name: str) -> dict[str, Any]:
        """Retrieve a context dict from the root provider."""
        context = self.provider.get_context(context_name)
        assert context is not None, f"Context {context_name} not found."
        return context

    def structural_copy(self: T) -> T:
        """Clone sharing weight leaves; Chains override to deep-copy structure."""
        clone = object.__new__(self.__class__)
        clone.__dict__.update({k: v for k, v in self.__dict__.items() if k not in self._pytree_ignore})
        clone._parent = []
        clone._can_refresh_parent = True
        return clone


class WeightedModule(Module):
    """A leaf module with weights; dtype derives from `.weight` (module.py:238)."""

    weight: jax.Array

    @property
    def dtype(self) -> jnp.dtype:
        return self.weight.dtype


class ModuleTree:
    """Pretty tree repr of a module hierarchy (module.py:267)."""

    def __init__(self, module: Module) -> None:
        self.root = self._module_to_tree(module)

    def generate(self, depth: int = -1) -> str:
        lines: list[str] = []
        self._render(self.root, lines, prefix="", is_last=True, is_root=True, depth=depth)
        return "\n".join(lines)

    def _module_to_tree(self, module: Module) -> dict[str, Any]:
        children = []
        if hasattr(module, "_modules"):
            seen: dict[str, int] = {}
            for name, child in module._modules.items():  # type: ignore[attr-defined]
                children.append((name, self._module_to_tree(child)))
        return {"label": repr(module), "children": children}

    def _render(
        self, node: dict[str, Any], lines: list[str], prefix: str, is_last: bool, is_root: bool, depth: int
    ) -> None:
        if is_root:
            lines.append(f"({node['label']})")
        else:
            connector = "└── " if is_last else "├── "
            lines.append(f"{prefix}{connector}{node['label']}")
        if depth == 0:
            return
        children = node["children"]
        child_prefix = prefix if is_root else prefix + ("    " if is_last else "│   ")
        for i, (_, child) in enumerate(children):
            self._render(child, lines, child_prefix, i == len(children) - 1, False, depth - 1)


if TYPE_CHECKING:
    from refiners_tpu.fluxion.layers.chain import Chain
