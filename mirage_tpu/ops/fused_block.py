"""Pallas TPU fully-fused transformer block (inference):

  h = x + proj(SDPA(qkv(LN1(x))))          (ops/block_attention.py half)
  out = h + fc2(gelu(fc1(LN2(h))))         (ops/fused_mlp.py half)

in ONE kernel — one grid program per batch element, every weight
VMEM-resident across the grid. Semantics: mirage/utils.py:226-262
(pre-LN Block, exact-erf GELU).

MEASURED RESULT (v5e, flagship MIRAGE-Large inference, batch 64): this
merged kernel is SLOWER than the two half-block kernels it replaces
(821 vs 866 img/s). The intermediate HBM round-trip between the halves is
fully hidden by Mosaic's grid pipelining, and the merged body schedules
worse (bigger VMEM footprint, less double-buffering headroom). Kept as a
documented negative result; nn/block.py dispatches to the half kernels.

VMEM at the flagship shape (N=257, D=1024, H=16): weights 25.2 MB bf16 +
scores scratch 4.2 MB f32 + activations ~7 MB — inside the 64 MB scoped
limit (v5e has 128 MB VMEM).
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

from mirage_tpu.ops.fused_mlp import _SQRT2, _erf


def _ln(t, g_ref, b_ref):
    t32 = t.astype(jnp.float32)
    mean = jnp.mean(t32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t32 - mean), axis=-1, keepdims=True)
    y = (t32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * g_ref[...].astype(jnp.float32)
            + b_ref[...].astype(jnp.float32)).astype(t.dtype)


def _block_kernel(x_ref, g1_ref, b1n_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                  g2_ref, b2n_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref, attn_scratch, s_scratch, *, num_heads: int,
                  dim: int, scale: float, elems: int = 1):
    dh = dim // num_heads
    for ei in range(elems):
        x = x_ref[ei]
        # ---- attention half (3-phase softmax batching) ----
        y = _ln(x, g1_ref, b1n_ref)
        qkv = jax.lax.dot_general(
            y, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
        for h in range(num_heads):  # phase 1: all score matmuls
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
            s_scratch[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[...]  # phase 2: one softmax over all heads
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
        for h in range(num_heads):  # phase 3: all PV matmuls
            v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            o = jax.lax.dot_general(
                s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
        out = jax.lax.dot_general(
            attn_scratch[...], wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hmid = x + (out + bp_ref[...].astype(jnp.float32)).astype(x.dtype)
        # ---- MLP half ----
        y2 = _ln(hmid, g2_ref, b2n_ref)
        h1 = jax.lax.dot_general(y2, w1_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[...].astype(jnp.float32)
        h1 = 0.5 * h1 * (1.0 + _erf(h1 / _SQRT2))
        h1 = h1.astype(x.dtype)
        o2 = jax.lax.dot_general(h1, w2_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o2 = o2 + b2_ref[...].astype(jnp.float32)
        o_ref[ei] = hmid + o2.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _block_fwd(x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n, w1, b1, w2, b2,
               num_heads: int, scale: float, interpret: bool = False):
    b, n, d = x.shape
    hdim = w1.shape[-1]
    elems = 1
    kernel = functools.partial(_block_kernel, num_heads=num_heads, dim=d,
                               scale=scale, elems=elems)
    kwargs = {}
    if not _HAVE_PLTPU:  # pragma: no cover — gated to TPU/interpret paths
        raise RuntimeError("fused_block requires pallas TPU support")
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // elems,),
        in_specs=[
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)), wspec((1, d)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, hdim)), wspec((1, hdim)),
            wspec((hdim, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                        pltpu.VMEM((num_heads, n, n), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(x, g1.reshape(1, d), b1n.reshape(1, d), wqkv, bqkv.reshape(1, 3 * d),
      wproj, bproj.reshape(1, d), g2.reshape(1, d), b2n.reshape(1, d),
      w1, b1.reshape(1, hdim), w2, b2.reshape(1, d))


def _block_xla(x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n, w1, b1, w2, b2,
               num_heads, scale):
    from mirage_tpu.ops.block_attention import _attn_half_xla
    from mirage_tpu.ops.fused_mlp import _mlp_block_xla

    h = _attn_half_xla(x, g1, b1n, wqkv, bqkv, wproj, bproj, num_heads, scale)
    return _mlp_block_xla(h, g2, b2n, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def _block(x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n, w1, b1, w2, b2,
           num_heads, scale):
    return _block_fwd(x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n,
                      w1, b1, w2, b2, num_heads, scale)


def _block_fwd_vjp(x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n, w1, b1,
                   w2, b2, num_heads, scale):
    res = (x, g1, b1n, wqkv, bqkv, wproj, bproj, g2, b2n, w1, b1, w2, b2)
    return _block_fwd(*res, num_heads, scale), res


def _block_bwd_vjp(num_heads, scale, res, g):
    _, vjp = jax.vjp(lambda *a: _block_xla(*a, num_heads, scale), *res)
    return vjp(g)


_block.defvjp(_block_fwd_vjp, _block_bwd_vjp)


def fused_block(x, p, num_heads: int, interpret: bool = False):
    """Whole pre-LN transformer block over pytree params
    ({'norm1','attn','norm2','mlp'}); mirage/utils.py:226-262 semantics.
    Inference path (backward recomputes via XLA)."""
    d = x.shape[-1]
    scale = (d // num_heads) ** -0.5
    bqkv = p["attn"]["qkv"].get("b")
    if bqkv is None:
        bqkv = jnp.zeros((3 * d,), x.dtype)
    args = (x, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["w"], bqkv,
            p["attn"]["proj"]["w"], p["attn"]["proj"]["b"],
            p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"],
            p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"])
    if interpret:
        return _block_fwd(*args, num_heads, scale, interpret=True)
    return _block(*args, num_heads, scale)
