"""Pallas TPU fused attention for SHORT sequences (N <= ~512).

Covers the two headline MIRAGE workloads the flash kernel in
ops/flash_attention.py does not: MIRAGE-Large inference (257 tokens) and
pretraining (99 visible tokens). Replaces the reference's
F.scaled_dot_product_attention (mirage/utils.py:181) on these shapes.

Why a separate kernel: at N=257 the flash kernel's (B*H,)-sized grid loses to
plain XLA — per-program overhead dominates matmuls this small, and the HBM
pad-to-128 copies cost more than the attention itself (measured on v5e,
BASELINE.md round 1). This kernel instead:

  - takes the RAW fused-qkv projection output (B, N, 3*D) — the natural
    layout coming off the MXU — and emits (B, N, D), the natural input of
    the out-projection. The (B,N,3,H,Dh)->(3,B,H,N,Dh) transpose and the
    head-merge transpose of the generic path never materialize in HBM.
  - runs ONE grid program per batch element (48 programs at the bench batch,
    not 48*16) and loops the heads inside, so per-program overhead amortizes
    over all heads while Mosaic pipelines the next element's DMA.
  - keeps the whole (N, N) score matrix per head in VMEM: plain
    max-subtracted softmax, f32, no online-softmax bookkeeping, and no HBM
    round-trip for probabilities (the XLA path materializes them).
  - uses no padding at the HBM level: blocks span the full (unaligned)
    N and 3D dims and Mosaic masks the ragged tiles.

VMEM per program at the flagship shape (N=257, D=1024): qkv 1.6 MB + out
0.5 MB + scores 0.3 MB, double-buffered — comfortably inside the ~16 MB
budget.

Backward: custom_vjp recomputing attention per-head with XLA einsums from the
saved qkv (at N<=512 the (N,N) probs are tiny; the matmuls dominate either
way). This keeps the kernel usable inside jax.grad (pretraining at N=99).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def _block_attn_kernel(qkv_ref, o_ref, *, num_heads: int, dim: int, scale: float):
    x = qkv_ref[0]  # (N, 3D) in compute dtype
    dh = dim // num_heads
    for h in range(num_heads):
        q = x[:, h * dh:(h + 1) * dh]
        k = x[:, dim + h * dh:dim + (h + 1) * dh]
        v = x[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # normalize the (N, Dh) output, not the (N, N) probs: Dh/N times
        # less VPU work for the same math
        o_ref[0, :, h * dh:(h + 1) * dh] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _block_attn_fwd(qkv, num_heads: int, scale: float, interpret: bool = False):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    kernel = functools.partial(_block_attn_kernel, num_heads=num_heads,
                               dim=dim, scale=scale)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, three_d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(qkv)


def _attn_xla(qkv, num_heads: int, scale: float):
    """Reference path on the same (B, N, 3D) layout (used for the backward
    recompute and as the CPU fallback)."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    dh = dim // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, dh)
    q = qkv5[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _block_attn(qkv, num_heads, scale):
    return _block_attn_fwd(qkv, num_heads, scale)


def _block_attn_fwd_vjp(qkv, num_heads, scale):
    return _block_attn_fwd(qkv, num_heads, scale), (qkv,)


def _block_attn_bwd_vjp(num_heads, scale, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _attn_xla(t, num_heads, scale), qkv)
    return vjp(g)


_block_attn.defvjp(_block_attn_fwd_vjp, _block_attn_bwd_vjp)


def block_attention(qkv, num_heads: int, scale: float, interpret: bool = False):
    """Fused multi-head self-attention over a packed qkv tensor.

    qkv: (B, N, 3*D) — the fused qkv projection output, column order
    (q|k|v) x heads x head_dim (torch reshape (B,N,3,H,Dh) semantics,
    mirage/utils.py:176-179). Returns (B, N, D) merged-head outputs.
    Differentiable (backward recomputes via XLA). `interpret=True` runs the
    Pallas interpreter (CPU tests).
    """
    if interpret:
        return _block_attn_fwd(qkv, num_heads, scale, interpret=True)
    return _block_attn(qkv, num_heads, scale)
