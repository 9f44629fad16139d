"""Patch embedding as reshape + matmul (MXU-native).

The reference implements patch embedding as a strided Conv2d
(mirage/input_adapters.py:78-81, :202-205). A P-stride PxP conv is exactly a
block-reshape followed by a dense matmul; expressing it that way hands XLA a
single large MXU matmul (batch*num_patches, P*P*C) @ (P*P*C, D) that fuses
with the positional-embedding add — no im2col, no conv lowering.

Weight layout: (C*P_H*P_W, D) with (c, ph, pw) flattened row order, so the
torch Conv2d weight (D, C, P_H, P_W) converts via ``w.reshape(D, -1).T``.
"""

import jax.numpy as jnp


def patchify(x, ph: int, pw: int):
    """(B, C, H, W) -> (B, N_H*N_W, C*ph*pw), patch-major (c, ph, pw) flat."""
    b, c, h, w = x.shape
    nh, nw = h // ph, w // pw
    x = x.reshape(b, c, nh, ph, nw, pw)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, nh * nw, c * ph * pw)


def unpatchify(x, nh: int, nw: int, ph: int, pw: int, c: int):
    """(B, N, c*ph*pw) -> (B, C, H, W), inverse of the reference rearrange
    'b (nh nw) (c ph pw) -> b c (nh ph) (nw pw)' (output_adapters.py:291-294)."""
    b = x.shape[0]
    x = x.reshape(b, nh, nw, c, ph, pw)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, nh * ph, nw * pw)


def patch_embed(x, w, b, ph: int, pw: int, pos_emb_tokens=None, compute_dtype=None):
    """Fused patchify + project + (optional) posemb add.

    Args:
      x: (B, C, H, W) image.
      w: (C*ph*pw, D) projection weight; b: (D,) bias.
      pos_emb_tokens: optional (1, N, D) positional embedding to add.
    Returns (B, N, D).
    """
    patches = patchify(x, ph, pw)
    if compute_dtype is not None:
        patches = patches.astype(compute_dtype)
        w = w.astype(compute_dtype)
    tokens = patches @ w + b.astype(patches.dtype)
    if pos_emb_tokens is not None:
        tokens = tokens + pos_emb_tokens.astype(tokens.dtype)
    return tokens
