"""Micro-bench: do tile-aligned padded sequences (257 -> 264 tokens + key
masking) beat the ragged-257 kernels? bf16 tiles are (16,128), so 257 rows
occupy 272 sublanes (5.8% waste) while 264 rows stay at 264 + masking cost.
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

from mirage_tpu.ops.fused_mlp import _mlp_kernel
from mirage_tpu.ops.block_attention import _attn_half_kernel

REPS = 24


def _attn_half_masked_kernel(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref,
                             wp_ref, bp_ref, o_ref, attn_scratch, s_scratch,
                             *, num_heads: int, dim: int, scale: float,
                             n_valid: int):
    x = x_ref[0]
    n = x.shape[0]
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
    neg = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_valid,
                    0.0, -1e30)
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg
    s = s_scratch[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    s_scratch[...] = e
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        o = jax.lax.dot_general(
            s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
    out = jax.lax.dot_general(
        attn_scratch[...], wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bp_ref[...].astype(jnp.float32)
    o_ref[0] = x + out.astype(x.dtype)


def make_attn(masked, num_heads, n_valid):
    def call(x, gamma, beta, wqkv, bqkv, wproj, bproj):
        b, n, d = x.shape
        scale = (d // num_heads) ** -0.5
        if masked:
            kernel = functools.partial(_attn_half_masked_kernel,
                                       num_heads=num_heads, dim=d,
                                       scale=scale, n_valid=n_valid)
        else:
            kernel = functools.partial(_attn_half_kernel, num_heads=num_heads,
                                       dim=d, scale=scale)
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


def make_mlp_flat():
    """264-aligned: flatten (b, 264, d) -> (b*264, d), 528-row blocks."""
    def call(x, gamma, beta, w1, b1, w2, b2):
        b, n, d = x.shape
        hdim = w1.shape[-1]
        m = b * n
        blk = 528
        w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
                   for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                                 (hdim, d), (1, d))]
        out = pl.pallas_call(
            _mlp_kernel,
            out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
            grid=(pl.cdiv(m, blk),),
            in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
            out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x.reshape(m, d), gamma.reshape(1, d), beta.reshape(1, d), w1,
          b1.reshape(1, hdim), w2, b2.reshape(1, d))
        return out.reshape(b, n, d)
    return call


def make_mlp_3d():
    def call(x, gamma, beta, w1, b1, w2, b2):
        b, n, d = x.shape
        hdim = w1.shape[-1]
        w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
                   for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                                 (hdim, d), (1, d))]
        return pl.pallas_call(
            _mlp_kernel,
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
    b, heads, d = 64, 16, 1024
    hdim = 4 * d
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
    for n in (257, 264):
        x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, jnp.bfloat16)
        bench(f"mlp3d/n={n} ", make_mlp_3d(), x, gamma, beta, w1, b1, w2, b2)
        if n == 264:
            bench(f"mlpflat/n={n}", make_mlp_flat(), x, gamma, beta, w1, b1, w2, b2)
        bench(f"attn/n={n}  ", make_attn(n != 257, heads, 257), x, gamma, beta,
              wqkv, bqkv, wp, bp)
