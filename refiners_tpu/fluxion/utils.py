"""Tensor/image utilities and safetensors I/O.

Reference: /root/reference/src/refiners/fluxion/utils.py (:17-316).
Convention: images are **NHWC** float arrays in [0, 1] (channels-last is the
TPU-native conv layout); `image_to_tensor`/`tensor_to_image` convert PIL both
ways.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from refiners_tpu.fluxion.rng import manual_seed  # re-export (reference utils.py:20)

__all__ = [
    "norm",
    "manual_seed",
    "no_grad",
    "pad",
    "interpolate",
    "normalize",
    "gaussian_blur",
    "image_to_tensor",
    "images_to_tensor",
    "tensor_to_image",
    "tensor_to_images",
    "load_tensors",
    "load_from_safetensors",
    "save_to_safetensors",
    "safe_open",
    "summarize_tensor",
    "str_to_dtype",
    "device_has_bfloat16",
]


def norm(x: jax.Array) -> jax.Array:
    return jnp.linalg.norm(x)


@contextlib.contextmanager
def no_grad() -> Iterator[None]:
    """No-op under JAX (gradients are explicit); kept for API parity (utils.py:23)."""
    yield


def pad(x: jax.Array, pad: tuple[int, ...] | list[int], value: float = 0.0, mode: str = "constant") -> jax.Array:
    """torch.nn.functional.pad semantics: pairs apply to trailing dims, last
    dim first (utils.py:30)."""
    widths = [(0, 0)] * x.ndim
    pairs = [tuple(pad[i : i + 2]) for i in range(0, len(pad), 2)]
    for i, pair in enumerate(pairs):
        widths[x.ndim - 1 - i] = pair  # type: ignore[call-overload]
    if mode == "constant":
        return jnp.pad(x, widths, constant_values=value)
    return jnp.pad(x, widths, mode=mode)  # type: ignore[arg-type]


def _cubic_kernel(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    absd = np.abs(d)
    return np.where(
        absd <= 1.0,
        (a + 2) * absd**3 - (a + 3) * absd**2 + 1,
        np.where(absd < 2.0, a * absd**3 - 5 * a * absd**2 + 8 * a * absd - 4 * a, 0.0),
    )


def _cubic_weights(in_size: int, out_size: int, antialias: bool) -> jax.Array:
    """(out, in) torch-compatible bicubic weight matrix (a=-0.75, half-pixel).

    Mirrors torch's `_upsample_bicubic2d_aa` windowing; antialias widens the
    kernel only when downscaling.
    """
    scale = in_size / out_size
    if not antialias:
        # plain bicubic (a=-0.75): 4 taps around the source position
        centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        lo = np.floor(centers).astype(np.int64) - 1
        idx = lo[:, None] + np.arange(4)[None, :]
        w = _cubic_kernel(centers[:, None] - idx)
    else:
        # PIL-compatible antialiased bicubic (a=-0.5), torch's antialias=True
        kernel_scale = max(scale, 1.0)
        support = 2.0 * kernel_scale
        invscale = 1.0 / kernel_scale
        centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
        xmin = np.maximum((centers - support + 0.5).astype(np.int64), 0)
        taps = int(np.ceil(support)) * 2 + 1
        idx = xmin[:, None] + np.arange(taps)[None, :]
        w = _cubic_kernel((idx - centers[:, None] + 0.5) * invscale, a=-0.5)
        w = np.where(idx < in_size, w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, in_size - 1)
    dense = np.zeros((out_size, in_size), dtype=np.float32)
    for j in range(idx.shape[1]):
        np.add.at(dense, (np.arange(out_size), idx[:, j]), w[:, j])
    return jnp.asarray(dense)


def _bicubic_resize(x: jax.Array, size: tuple[int, int], antialias: bool) -> jax.Array:
    """Separable bicubic resize of NHWC matching torch's `bicubic` (a=-0.75)."""
    h, w = size
    wh = _cubic_weights(x.shape[1], h, antialias)
    ww = _cubic_weights(x.shape[2], w, antialias)
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", ww, y).transpose(0, 1, 2, 3)


def interpolate(
    x: jax.Array,
    size: tuple[int, int],
    mode: str = "nearest",
    antialias: bool = False,
) -> jax.Array:
    """Resize NHWC `x` to spatial `size` (utils.py:34); torch conventions."""
    if mode == "bicubic":
        return _bicubic_resize(x, size, antialias).astype(x.dtype)
    if mode == "nearest":
        # torch's nearest uses floor(i·scale) source indices (no half-pixel shift)
        h_idx = (np.arange(size[0]) * (x.shape[1] / size[0])).astype(np.int64)
        w_idx = (np.arange(size[1]) * (x.shape[2] / size[1])).astype(np.int64)
        return x[:, h_idx][:, :, w_idx]
    method = {
        "bilinear": "linear",
        "lanczos": "lanczos3",
    }[mode]
    out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method=method, antialias=antialias)
    return y.astype(x.dtype)


def normalize(
    x: jax.Array, mean: list[float] | None = None, std: list[float] | None = None
) -> jax.Array:
    """Per-channel normalize of NHWC (utils.py:49)."""
    mean = [0.5] * x.shape[-1] if mean is None else mean
    std = [0.5] * x.shape[-1] if std is None else std
    assert len(mean) == len(std) == x.shape[-1], "mean/std length must match channel count"
    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(std, dtype=jnp.float32)
    return ((x.astype(jnp.float32) - m) / s).astype(x.dtype)


def gaussian_blur(
    x: jax.Array, kernel_size: int | tuple[int, int], sigma: float | tuple[float, float] | None = None
) -> jax.Array:
    """Depthwise gaussian blur of NHWC (utils.py:65)."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    if sigma is None:
        sh, sw = 0.3 * ((kh - 1) * 0.5 - 1) + 0.8, 0.3 * ((kw - 1) * 0.5 - 1) + 0.8
    else:
        sh, sw = (sigma, sigma) if isinstance(sigma, (int, float)) else sigma

    def kernel1d(k: int, s: float) -> jax.Array:
        r = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2
        g = jnp.exp(-(r**2) / (2 * s * s))
        return g / jnp.sum(g)

    gh = kernel1d(kh, sh)
    gw = kernel1d(kw, sw)
    c = x.shape[-1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.tile(gh.reshape(kh, 1, 1, 1), (1, 1, 1, c))
    ww = jnp.tile(gw.reshape(1, kw, 1, 1), (1, 1, 1, c))
    # torchvision semantics: reflect-pad, then VALID separable convs
    xf = jnp.pad(xf, ((0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)), mode="reflect")
    xf = jax.lax.conv_general_dilated(
        xf, wh, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    xf = jax.lax.conv_general_dilated(
        xf, ww, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return xf.astype(dtype)


def image_to_tensor(image: Image.Image, device: Any = None, dtype: Any = None) -> jax.Array:
    """PIL → (1, H, W, C) float in [0, 1] (utils.py:116).

    Matches the reference's special cases: 8-bit grayscale stays 1-channel and
    1-bit images are thresholded.
    """
    arr = np.asarray(image)
    if image.mode == "1":
        arr = arr.astype(np.float32)
    elif image.mode == "I":
        arr = arr.astype(np.float32) / (2**32 - 1) * 255.0 / 255.0
    else:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return jnp.asarray(arr[None], dtype=dtype or jnp.float32)


def images_to_tensor(images: list[Image.Image], device: Any = None, dtype: Any = None) -> jax.Array:
    return jnp.concatenate([image_to_tensor(im, device=device, dtype=dtype) for im in images], axis=0)


def tensor_to_image(tensor: jax.Array) -> Image.Image:
    """(1, H, W, C) or (H, W, C) float [0,1] → PIL (utils.py:150)."""
    arr = np.asarray(tensor.astype(jnp.float32))
    if arr.ndim == 4:
        assert arr.shape[0] == 1, "batched tensors use tensor_to_images"
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    return Image.fromarray((arr * 255).round().astype(np.uint8))


def tensor_to_images(tensor: jax.Array) -> list[Image.Image]:
    return [tensor_to_image(t) for t in tensor]


def load_tensors(path: Path | str) -> dict[str, Any]:
    """Load a torch .pt/.bin checkpoint via torch (CPU), as jnp arrays (utils.py:188).

    Nested dicts are converted recursively — textual-inversion embeddings ship
    as e.g. ``{"string_to_param": {"*": tensor}}`` (the A1111 format the
    reference's MultiUpscaler walks with a dot-separated key)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)  # type: ignore[no-untyped-call]

    def convert(v: Any) -> Any:
        if isinstance(v, dict):
            return {k: convert(x) for k, x in v.items()}
        return jnp.asarray(np.asarray(v.to(torch.float32) if v.dtype == torch.bfloat16 else v))

    return convert(state)


def load_from_safetensors(path: Path | str, device: Any = None) -> dict[str, jax.Array]:
    """Load a safetensors file into a flat dict of jnp arrays (utils.py:211)."""
    from safetensors import safe_open as _safe_open

    out: dict[str, jax.Array] = {}
    with _safe_open(str(path), framework="numpy") as f:  # type: ignore[no-untyped-call]
        for key in f.keys():
            try:
                out[key] = jnp.asarray(f.get_tensor(key))
            except (TypeError, ValueError):
                # dtypes numpy can't express (e.g. bfloat16): go through torch
                import torch
                from safetensors import safe_open as _so

                with _so(str(path), framework="pt") as g:  # type: ignore[no-untyped-call]
                    t = g.get_tensor(key)
                    out[key] = jnp.asarray(np.asarray(t.to(torch.float32))).astype(jnp.bfloat16)
    return out


def safe_open(path: Path | str, framework: str = "numpy", device: str = "cpu") -> Any:
    from safetensors import safe_open as _safe_open

    return _safe_open(str(path), framework=framework, device=device)  # type: ignore[no-untyped-call]


def save_to_safetensors(path: Path | str, tensors: dict[str, jax.Array], metadata: dict[str, str] | None = None) -> None:
    """Save a flat dict of arrays to safetensors (utils.py:224)."""
    from safetensors.numpy import save_file

    np_tensors = {}
    for k, v in tensors.items():
        arr = np.asarray(v)
        if arr.dtype == jnp.bfloat16:
            # numpy has no bf16: round-trip via uint16 view with dtype metadata
            arr = np.asarray(v.astype(jnp.float32))
        np_tensors[k] = arr
    save_file(np_tensors, str(path), metadata=metadata)


def summarize_tensor(tensor: jax.Array, /) -> str:
    """One-line tensor summary (utils.py:235)."""
    info = [
        f"shape=({', '.join(map(str, tensor.shape))})",
        f"dtype={tensor.dtype}",
    ]
    if tensor.size > 0:
        t = tensor.astype(jnp.float32)
        info += [
            f"min={float(jnp.min(t)):.2f}",
            f"max={float(jnp.max(t)):.2f}",
            f"mean={float(jnp.mean(t)):.2f}",
            f"std={float(jnp.std(t)):.2f}",
            f"norm={float(jnp.linalg.norm(t)):.2f}",
            f"grad=False",
        ]
    return "Tensor(" + ", ".join(info) + ")"


def str_to_dtype(dtype: str) -> jnp.dtype:
    """Map a string to a jnp dtype (utils.py:282)."""
    match dtype.lower():
        case "float32" | "float":
            return jnp.dtype(jnp.float32)
        case "float64" | "double":
            return jnp.dtype(jnp.float64)
        case "float16" | "half":
            return jnp.dtype(jnp.float16)
        case "bfloat16" | "bf16":
            return jnp.dtype(jnp.bfloat16)
        case "int32" | "int":
            return jnp.dtype(jnp.int32)
        case "int64" | "long":
            return jnp.dtype(jnp.int64)
        case "int16" | "short":
            return jnp.dtype(jnp.int16)
        case "int8":
            return jnp.dtype(jnp.int8)
        case "uint8" | "byte":
            return jnp.dtype(jnp.uint8)
        case "bool":
            return jnp.dtype(jnp.bool_)
        case _:
            raise ValueError(f"Unknown dtype: {dtype}")


def device_has_bfloat16(device: Any = None) -> bool:
    """TPUs natively support bfloat16 (utils.py:316)."""
    return jax.default_backend() in ("tpu", "axon") or True
