"""Micro-bench: decompose the non-MXU time of the two encoder half-block
kernels at the flagship shape (B=64, N=257, D=1024, H=16).

Round-3 question: the step trace shows attn_half at ~17.5 us/program vs a
13.3 us serialized-MXU floor and mlp_block at ~25.9 vs 21.9 — where do the
~4 us/program go (LN reductions? softmax exp? GELU erf? per-program fixed
cost)? Ablations replace each stage with (wrong but shape-identical) cheap
math to expose its serialized cost; candidate fixes (one-pass LN moments,
bf16 polynomial) are measured against them.
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


def _ln(x32, g_ref, be_ref, mode):
    if mode == "skip":
        return x32
    if mode == "onepass":
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        ex2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = ex2 - jnp.square(mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)


def _attn_kernel_v(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                   o_ref, attn_scratch, s_scratch, *, num_heads, dim, scale,
                   ln, smax):
    x = x_ref[0]
    y = _ln(x.astype(jnp.float32), g_ref, be_ref, ln).astype(x.dtype)
    qkv = jax.lax.dot_general(y, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    dh = dim // num_heads
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    s = s_scratch[...]
    if smax == "skip":          # WRONG math: exposes softmax serialized cost
        l = jnp.sum(s, axis=-1, keepdims=True)
    elif smax == "nomax":       # skip the max pass (unsafe generally)
        e = jnp.exp(s)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
    elif smax == "exp2":        # exp via exp2 with folded log2(e)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * 1.4426950408889634)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        o = jax.lax.dot_general(s_scratch[h].astype(x.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
    out = jax.lax.dot_general(attn_scratch[...], wp_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = x + (out + bp_ref[...].astype(jnp.float32)).astype(x.dtype)


def _attn_kernel_pipe2(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
                       bp_ref, o_ref, a0, a1, s0, s1, *, num_heads, dim,
                       scale):
    """2 elements per program with phase-interleaved MXU/VPU: element 1's
    score matmuls issue between element 0's softmax ops (separate scratch
    buffers so no aliasing forces serialization)."""
    dh = dim // num_heads

    def ln_qkv(ei):
        x = x_ref[ei]
        y = _ln(x.astype(jnp.float32), g_ref, be_ref, "v0").astype(x.dtype)
        qkv = jax.lax.dot_general(y, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)

    def scores(qkv, s):
        for h in range(num_heads):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
            s[h] = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32) * scale

    def smax(s):
        v = s[...]
        m = jnp.max(v, axis=-1, keepdims=True)
        e = jnp.exp(v - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s[...] = e
        return l

    def pv_proj(ei, qkv, s, l, a):
        for h in range(num_heads):
            v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            o = jax.lax.dot_general(s[h].astype(qkv.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(qkv.dtype)
        out = jax.lax.dot_general(a[...], wp_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[ei] = x_ref[ei] + (out + bp_ref[...].astype(jnp.float32)
                                 ).astype(o_ref.dtype)

    qkv0 = ln_qkv(0)
    scores(qkv0, s0)
    qkv1 = ln_qkv(1)          # MXU while s0's softmax could run...
    l0 = smax(s0)             # VPU
    scores(qkv1, s1)          # MXU
    pv_proj(0, qkv0, s0, l0, a0)
    l1 = smax(s1)
    pv_proj(1, qkv1, s1, l1, a1)


def make_attn_pipe2(num_heads):
    def call(x, gamma, beta, wqkv, bqkv, wproj, bproj):
        b, n, d = x.shape
        scale = (d // num_heads) ** -0.5
        kernel = functools.partial(_attn_kernel_pipe2, num_heads=num_heads,
                                   dim=d, scale=scale)
        wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b // 2,),
            in_specs=[pl.BlockSpec((2, n, d), lambda i: (i, 0, 0)),
                      wspec((1, d)), wspec((1, d)), wspec((d, 3 * d)),
                      wspec((1, 3 * d)), wspec((d, d)), wspec((1, d))],
            out_specs=pl.BlockSpec((2, n, d), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                            pltpu.VMEM((n, d), x.dtype),
                            pltpu.VMEM((num_heads, n, n), jnp.float32),
                            pltpu.VMEM((num_heads, n, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, gamma.reshape(1, d), beta.reshape(1, d), wqkv,
          bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d))
    return call


def _mlp_kernel_pipe2(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref):
    """2 elements with fc1(e1) issued between gelu(e0) and fc2(e0)."""
    def ln_fc1(ei):
        x = x_ref[ei]
        y = _ln(x.astype(jnp.float32), g_ref, be_ref, "v0").astype(x.dtype)
        h = jax.lax.dot_general(y, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return h + b1_ref[...].astype(jnp.float32)

    def gelu(h):
        return (0.5 * h * (1.0 + _erf(h / _SQRT2))).astype(x_ref.dtype)

    def fc2(ei, h):
        o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[ei] = x_ref[ei] + (o + b2_ref[...].astype(jnp.float32)
                                 ).astype(o_ref.dtype)

    h0 = ln_fc1(0)
    h1 = ln_fc1(1)   # MXU
    g0 = gelu(h0)    # VPU
    fc2(0, g0)       # MXU
    g1 = gelu(h1)    # VPU
    fc2(1, g1)


def make_mlp_pipe2():
    def call(x, gamma, beta, w1, b1, w2, b2):
        b, n, d = x.shape
        hdim = w1.shape[-1]
        w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
                   for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                                 (hdim, d), (1, d))]
        return pl.pallas_call(
            _mlp_kernel_pipe2,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b // 2,),
            in_specs=[pl.BlockSpec((2, n, d), lambda i: (i, 0, 0))] + w_specs,
            out_specs=pl.BlockSpec((2, n, d), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hdim),
          w2, b2.reshape(1, d))
    return call


def make_attn(num_heads, ln="v0", smax="v0"):
    def call(x, gamma, beta, wqkv, bqkv, wproj, bproj):
        b, n, d = x.shape
        scale = (d // num_heads) ** -0.5
        kernel = functools.partial(_attn_kernel_v, num_heads=num_heads, dim=d,
                                   scale=scale, ln=ln, smax=smax)
        wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
                      wspec((1, d)), wspec((1, d)), wspec((d, 3 * d)),
                      wspec((1, 3 * d)), wspec((d, d)), wspec((1, d))],
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                            pltpu.VMEM((num_heads, n, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, gamma.reshape(1, d), beta.reshape(1, d), wqkv,
          bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d))
    return call


def _mlp_kernel_v(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, ln, act):
    x = x_ref[0]
    y = _ln(x.astype(jnp.float32), g_ref, be_ref, ln).astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    if act == "skip":           # WRONG math: exposes GELU serialized cost
        h = h
    elif act == "bf16":         # polynomial erf evaluated in bf16
        hb = h.astype(jnp.bfloat16)
        h = 0.5 * hb * (1.0 + _erf(hb / jnp.bfloat16(_SQRT2)))
    elif act == "hastings":     # A&S 7.1.28: div + pow16, NO exp (3e-7 err)
        z = h * (1.0 / _SQRT2)
        az = jnp.abs(z)
        a = (0.0705230784, 0.0422820123, 0.0092705272,
             0.0001520143, 0.0002765672, 0.0000430638)
        q = 1.0 + az * (a[0] + az * (a[1] + az * (a[2] + az * (
            a[3] + az * (a[4] + az * a[5])))))
        q2 = q * q
        q4 = q2 * q2
        q8 = q4 * q4
        e = 1.0 - 1.0 / (q8 * q8)
        h = 0.5 * h * (1.0 + jnp.sign(z) * e)
    else:
        h = 0.5 * h * (1.0 + _erf(h / _SQRT2))
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = x + (o + b2_ref[...].astype(jnp.float32)).astype(x.dtype)


def make_mlp(ln="v0", act="v0"):
    def call(x, gamma, beta, w1, b1, w2, b2):
        b, n, d = x.shape
        hdim = w1.shape[-1]
        kernel = functools.partial(_mlp_kernel_v, ln=ln, act=act)
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


def chain(fn, x0, *weights):
    return jax.lax.fori_loop(0, REPS, lambda i, x: fn(x, *weights), x0)


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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "attn"):
        for tag, kw in [
            ("attn/v0        ", {}),
            ("attn/ln-skip   ", {"ln": "skip"}),
            ("attn/ln-onepass", {"ln": "onepass"}),
            ("attn/smax-skip ", {"smax": "skip"}),
            ("attn/smax-nomax", {"smax": "nomax"}),
            ("attn/smax-exp2 ", {"smax": "exp2"}),
        ]:
            bench(tag, make_attn(heads, **kw), x, gamma, beta, wqkv, bqkv, wp, bp)
        bench("attn/pipe2     ", make_attn_pipe2(heads), x, gamma, beta, wqkv,
              bqkv, wp, bp)
    if which in ("all", "mlp"):
        for tag, kw in [
            ("mlp/v0         ", {}),
            ("mlp/ln-skip    ", {"ln": "skip"}),
            ("mlp/ln-onepass ", {"ln": "onepass"}),
            ("mlp/act-skip   ", {"act": "skip"}),
            # act-bf16: Mosaic rejects bf16 vector compares on v5e (known)
            ("mlp/act-hasting", {"act": "hastings"}),
        ]:
            bench(tag, make_mlp(**kw), x, gamma, beta, w1, b1, w2, b2)
        bench("mlp/pipe2      ", make_mlp_pipe2(), x, gamma, beta, w1, b1,
              w2, b2)
