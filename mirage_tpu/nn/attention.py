"""Multi-head self- and cross-attention.

Parity: mirage/utils.py:162-223 (fused qkv / kv projections, SDPA with scale
head_dim**-0.5). The inner scaled-dot-product attention dispatches to a Pallas
flash-attention kernel on TPU (mirage_tpu.ops.flash_attention) and to a plain
XLA softmax path elsewhere (CPU tests, tiny shapes).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mirage_tpu.nn import init as vinit
from mirage_tpu.nn.layers import dropout, linear


def attention_init(key, dim, qkv_bias=False, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {
        "qkv": {"w": vinit.qkv_uniform(k1, dim, dim * 3, n_fused=3, dtype=dtype)},
        "proj": {
            "w": vinit.xavier_uniform(k2, (dim, dim), dtype=dtype),
            "b": jnp.zeros((dim,), dtype),
        },
    }
    if qkv_bias:
        p["qkv"]["b"] = jnp.zeros((dim * 3,), dtype)
    return p


def cross_attention_init(key, dim, qkv_bias=False, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "q": {"w": vinit.xavier_uniform(k1, (dim, dim), dtype=dtype)},
        "kv": {"w": vinit.qkv_uniform(k2, dim, dim * 2, n_fused=2, dtype=dtype)},
        "proj": {
            "w": vinit.xavier_uniform(k3, (dim, dim), dtype=dtype),
            "b": jnp.zeros((dim,), dtype),
        },
    }
    if qkv_bias:
        p["q"]["b"] = jnp.zeros((dim,), dtype)
        p["kv"]["b"] = jnp.zeros((dim * 2,), dtype)
    return p


def sdpa(q, k, v, scale, *, impl: str = "auto", attn_drop: float = 0.0,
         deterministic: bool = True, rng: Optional[jax.Array] = None):
    """Scaled dot-product attention over (B, H, N, Dh) tensors.

    impl: 'auto' picks the Pallas flash kernel on TPU when shapes allow,
    otherwise the XLA reference path. Attention-matrix dropout (attn_drop>0,
    train-time only) forces the XLA path — all reference configs use 0.0.
    """
    use_flash = False
    if impl in ("auto", "flash"):
        if (attn_drop == 0.0 or deterministic) and _on_tpu():
            use_flash = True
        if impl == "auto" and k.shape[2] < 512:
            # Measured on v5e: below ~512 keys the XLA fused path beats the
            # kernel (per-program overhead dominates the tiny matmuls).
            use_flash = False
    if impl == "xla":
        use_flash = False
    if use_flash:
        from mirage_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, sm_scale=scale)
    return sdpa_xla(q, k, v, scale, attn_drop=attn_drop, deterministic=deterministic, rng=rng)


def sdpa_xla(q, k, v, scale, *, attn_drop=0.0, deterministic=True, rng=None):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    probs = dropout(probs, attn_drop, deterministic=deterministic, rng=rng)
    return jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)


def _on_tpu() -> bool:
    """Kernel gate — delegates to ops.runtime so tests can force the fused
    paths on (interpret mode) off-TPU. Name kept for the many import sites."""
    from mirage_tpu.ops import runtime

    return runtime.kernels_enabled()


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _use_block_kernel(impl, n, attn_drop, deterministic, head_dim):
    """Short-sequence fused kernel (ops/block_attention.py): covers the
    flagship inference (257 tokens) / pretraining (99) shapes where both the
    flash kernel and the XLA path lose (BASELINE.md round 1). Attention
    dropout (train-time only; all reference configs use 0.0) needs the XLA
    probs, so it forces the generic path."""
    if impl not in ("auto", "block"):
        return False
    if attn_drop > 0.0 and not deterministic:
        return False
    if head_dim % 32 != 0:
        # non-32-multiple head dims hang the remote XLA pipeline around the
        # packed kernels (observed at dh=48; 32/64 fine) — see nn/block.py
        return False
    return n <= 512 and _on_tpu()


def attention_apply(p, x, num_heads, *, impl="auto", attn_drop=0.0, proj_drop=0.0,
                    deterministic=True, rng=None):
    """Self-attention (mirage/utils.py:174-188)."""
    b, n, c = x.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    qkv_flat = linear(p["qkv"], x)
    if _use_block_kernel(impl, n, attn_drop, deterministic, head_dim):
        from mirage_tpu.ops.block_attention import block_attention

        out = block_attention(qkv_flat, num_heads, scale)
    else:
        qkv = qkv_flat.reshape(b, n, 3, num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = sdpa(q, k, v, scale, impl=impl, attn_drop=attn_drop,
                   deterministic=deterministic, rng=r1)
        out = _merge_heads(out)
    out = linear(p["proj"], out)
    out = dropout(out, proj_drop, deterministic=deterministic, rng=r2)
    return out


def cross_attention_apply(p, x, context, num_heads, *, impl="auto", attn_drop=0.0,
                          proj_drop=0.0, deterministic=True, rng=None):
    """Cross-attention: queries from x, fused kv from context
    (mirage/utils.py:205-223)."""
    b, n, c = x.shape
    m = context.shape[1]
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q = _split_heads(linear(p["q"], x), num_heads)
    kv = linear(p["kv"], context).reshape(b, m, 2, num_heads, head_dim)
    kv = kv.transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    out = sdpa(q, k, v, scale, impl=impl, attn_drop=attn_drop,
               deterministic=deterministic, rng=r1)
    out = _merge_heads(out)
    out = linear(p["proj"], out)
    out = dropout(out, proj_drop, deterministic=deterministic, rng=r2)
    return out
