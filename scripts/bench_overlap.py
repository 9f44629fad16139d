"""Micro-bench: MXU/VPU overlap variants of the two encoder half-block kernels.

Hypothesis (round-2 trace arithmetic): the fused MLP kernel exposes ~4 ms/step
of serialized GELU VPU time after the fc1 matmul, and the attention kernel
~3 ms/step of softmax VPU time between the score and PV matmul phases. The
MXU and VPU execute concurrently on TPU when ops are independent, so chunking
the hidden dim (MLP) / head groups (attention) should let Mosaic overlap the
VPU work of chunk c with the MXU work of chunk c+1.

Times 24-layer chains (like the MIRAGE-Large encoder) at the flagship shape.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirage_tpu.ops.fused_mlp import _erf, _SQRT2

REPS = 24


# ---------------------------------------------------------------- MLP kernels

def _mlp_kernel_chunked(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        o_ref, *, chunks: int):
    x = x_ref[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    hdim = w1_ref.shape[-1]
    ck = hdim // chunks
    outs = []
    for c in range(chunks):
        h = jax.lax.dot_general(y, w1_ref[:, c * ck:(c + 1) * ck],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + b1_ref[0, c * ck:(c + 1) * ck].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf(h / _SQRT2))
        h = h.astype(x.dtype)
        outs.append(jax.lax.dot_general(h, w2_ref[c * ck:(c + 1) * ck, :],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    o = outs[0]
    for c in range(1, chunks):
        o = o + outs[c]
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[0] = x + o.astype(x.dtype)


def make_mlp(chunks):
    from mirage_tpu.ops.fused_mlp import _mlp_kernel

    def call(x, gamma, beta, w1, b1, w2, b2):
        b, n, d = x.shape
        hdim = w1.shape[-1]
        if chunks == 0:
            kernel = _mlp_kernel
        else:
            kernel = functools.partial(_mlp_kernel_chunked, chunks=chunks)
        w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
                   for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                                 (hdim, d), (1, d))]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] + w_specs,
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hdim),
          w2, b2.reshape(1, d))
    return call


# ---------------------------------------------------- attention-half kernels

def _attn_half_grouped(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
                       bp_ref, o_ref, attn_scratch, s_scratch, *,
                       num_heads: int, dim: int, scale: float, group: int):
    x = x_ref[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    dh = dim // num_heads
    # per-group 3-phase: scores for group g+1 are independent of softmax/PV
    # of group g, so the scheduler can overlap MXU and VPU across groups.
    for g0 in range(0, num_heads, group):
        hs = range(g0, min(g0 + group, num_heads))
        for h in hs:
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
            s_scratch[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[g0:g0 + len(hs)]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[g0:g0 + len(hs)] = e
        for i, h in enumerate(hs):
            v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            o = jax.lax.dot_general(
                s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[i]).astype(x.dtype)
    out = jax.lax.dot_general(
        attn_scratch[...], wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bp_ref[...].astype(jnp.float32)
    o_ref[0] = x + out.astype(x.dtype)


def make_attn(group, num_heads):
    from mirage_tpu.ops.block_attention import _attn_half_kernel

    def call(x, gamma, beta, wqkv, bqkv, wproj, bproj):
        b, n, d = x.shape
        scale = (d // num_heads) ** -0.5
        if group == 0:
            kernel = functools.partial(_attn_half_kernel, num_heads=num_heads,
                                       dim=d, scale=scale)
        else:
            kernel = functools.partial(_attn_half_grouped, num_heads=num_heads,
                                       dim=d, scale=scale, group=group)
        wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
                wspec((1, d)), wspec((1, d)),
                wspec((d, 3 * d)), wspec((1, 3 * d)),
                wspec((d, d)), wspec((1, d)),
            ],
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                            pltpu.VMEM((num_heads, n, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, gamma.reshape(1, d), beta.reshape(1, d), wqkv,
          bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d))
    return call


def chain(fn, x0, *weights):
    def body(i, x):
        return fn(x, *weights)
    return jax.lax.fori_loop(0, REPS, body, x0)


def bench(tag, fn, x, *weights, iters=10):
    f = jax.jit(lambda x_, *w: chain(fn, x_, *w))
    float(jnp.sum(f(x, *weights).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = x
    for _ in range(iters):
        out = f(out, *weights)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"{tag}: {dt*1e3:.4f} ms/layer   ({dt*1e3*24:.2f} ms/24L)", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    b, n, heads, d = 64, 257, 16, 1024
    hdim = 4 * d
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, jnp.bfloat16)
    gamma = jnp.ones((d,), jnp.bfloat16)
    beta = jnp.zeros((d,), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, hdim)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((hdim,), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((hdim, d)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((d,), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * d,), jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((d, d)) * 0.02, jnp.bfloat16)
    bp = jnp.zeros((d,), jnp.bfloat16)
    print("devices:", jax.devices(), flush=True)

    for tag, c in [("mlp/v0     ", 0), ("mlp/chunk2 ", 2), ("mlp/chunk4 ", 4),
                   ("mlp/chunk8 ", 8)]:
        bench(tag, make_mlp(c), x, gamma, beta, w1, b1, w2, b2)
    for tag, g in [("attn/v0    ", 0), ("attn/group2", 2), ("attn/group4", 4),
                   ("attn/group8", 8)]:
        bench(tag, make_attn(g, heads), x, gamma, beta, wqkv, bqkv, wp, bp)
