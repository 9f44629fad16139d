"""Separable 2D resize with exact PyTorch ``F.interpolate`` semantics.

Why not ``jax.image.resize``: its bicubic kernel uses A=-0.5 (Keys) and its
coordinate conventions differ from torch's, which breaks the <1e-5 parity
target for positional-embedding interpolation (mirage/input_adapters.py:104,
mirage/output_adapters.py:176, mutils/pos_embed.py:7-23) and for the mask /
prediction upsampling paths (mirage/criterion.py:43, output_adapters.py:515).

Design: for static shapes we precompute the two 1-D interpolation matrices
W_h (out_h, in_h) and W_w (out_w, in_w) on the host with numpy, and apply the
resize as two matmuls — MXU-native, fuses with surrounding ops, and constant-
folds the weights into the executable. Supported modes: 'nearest', 'bilinear'
(align_corners True/False), 'bicubic' (A=-0.75, align_corners True/False) —
exactly the modes the reference uses.
"""

import functools

import numpy as np
import jax.numpy as jnp


def _source_index(scale, dst, align_corners, cubic):
    """torch's area_pixel_compute_source_index."""
    if align_corners:
        return scale * dst
    src = scale * (dst + 0.5) - 0.5
    if not cubic:
        src = np.maximum(src, 0.0)
    return src


def _scale(in_size, out_size, align_corners):
    if align_corners:
        if out_size > 1:
            return (in_size - 1) / (out_size - 1)
        return 0.0
    return in_size / out_size


def _cubic_weight(t, A=-0.75):
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        ((A + 2.0) * t - (A + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, (((A * t) - 5.0 * A) * t + 8.0 * A) * t - 4.0 * A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str, align_corners: bool):
    """Dense (out_size, in_size) float32 interpolation matrix matching torch."""
    W = np.zeros((out_size, in_size), dtype=np.float64)
    dst = np.arange(out_size, dtype=np.float64)
    if mode == "nearest":
        scale = in_size / out_size
        src = np.minimum(np.floor(dst * scale).astype(np.int64), in_size - 1)
        W[np.arange(out_size), src] = 1.0
    elif mode == "nearest-exact":
        scale = in_size / out_size
        src = np.minimum(np.floor((dst + 0.5) * scale).astype(np.int64), in_size - 1)
        W[np.arange(out_size), src] = 1.0
    elif mode == "bilinear":
        scale = _scale(in_size, out_size, align_corners)
        src = _source_index(scale, dst, align_corners, cubic=False)
        idx0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        idx1 = np.minimum(idx0 + 1, in_size - 1)
        lam1 = src - idx0
        lam0 = 1.0 - lam1
        np.add.at(W, (np.arange(out_size), idx0), lam0)
        np.add.at(W, (np.arange(out_size), idx1), lam1)
    elif mode == "bicubic":
        scale = _scale(in_size, out_size, align_corners)
        src = _source_index(scale, dst, align_corners, cubic=True)
        base = np.floor(src).astype(np.int64)
        t = src - base
        for tap in range(-1, 3):
            idx = np.clip(base + tap, 0, in_size - 1)
            w = _cubic_weight(tap - t)
            np.add.at(W, (np.arange(out_size), idx), w)
    else:
        raise ValueError(f"Unsupported resize mode: {mode}")
    return W.astype(np.float32)


def resize2d(x, out_size, mode="bilinear", align_corners=False):
    """Resize the trailing two dims of ``x`` to ``out_size=(H, W)`` with torch
    ``F.interpolate`` semantics. Identity shapes short-circuit for the common
    no-op posemb case."""
    out_h, out_w = out_size
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w) and mode in ("nearest", "nearest-exact"):
        return x
    Wh = jnp.asarray(_resize_matrix(in_h, out_h, mode, align_corners))
    Ww = jnp.asarray(_resize_matrix(in_w, out_w, mode, align_corners))
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # (..., H, W) -> (..., out_h, W) -> (..., out_h, out_w)
    # precision="highest": these are tiny matmuls on the parity-critical
    # posemb/mask paths — never let TPU matmul drop them to bf16.
    y = jnp.einsum("oh,...hw->...ow", Wh, x32, precision="highest")
    y = jnp.einsum("pw,...hw->...hp", Ww, y, precision="highest")
    return y.astype(dtype)
