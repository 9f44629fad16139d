"""A/B: fold the NEXT layer's LN1 into the MLP half-block's kernel tail
(VERDICT r3 task #9 — the r2-verdict idea never measured).

Hypothesis: the attention half's leading LN re-reads the (B, N, D) input it
just wrote, burning one VPU sweep + its reduction latency per layer (LN
reductions were 4.1 ms/step in the round-2 trace). If the MLP kernel
computes LN(out) while `out` is still in VMEM and emits the pre-normed
tensor alongside, the next attention half starts straight at the qkv matmul.

Cost side: the fold writes a SECOND (B, N, D) bf16 tensor to HBM per layer
(+1 output stream) and the attention half then reads two tensors (x for the
residual + y for qkv). Net HBM delta: +1 write +1 read of (B,N,D) vs the
saved in-kernel LN sweep — the arithmetic says roughly a wash; this bench
decides.

Flagship inference shape: B=48-per-512-batch grid, N=257, D=1024, H=16.
Usage (on chip): python scripts/bench_lnfold.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()  # JAX_PLATFORMS=cpu for the interpret-mode smoke

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirage_tpu.ops.block_attention import _attn_half_fwd
from mirage_tpu.ops.fused_mlp import _erf, _mlp_block_fwd

_SQRT2 = 1.4142135623730951
_LOG2E = 1.4426950408889634

# Flagship defaults; env knobs exist so the kernels can be smoke-run in the
# Pallas interpreter on CPU before burning a chip window (LNFOLD_INTERPRET=1
# LNFOLD_B=2 LNFOLD_N=65 LNFOLD_D=128 LNFOLD_H=4 python scripts/bench_lnfold.py).
B = int(os.environ.get("LNFOLD_B", 128))
N = int(os.environ.get("LNFOLD_N", 257))
D = int(os.environ.get("LNFOLD_D", 1024))
H = int(os.environ.get("LNFOLD_H", 16))
HDIM = 4 * D
ITERS = int(os.environ.get("LNFOLD_ITERS", 30))
INTERPRET = os.environ.get("LNFOLD_INTERPRET", "0") == "1"


def _ln(x32, g_ref, b_ref):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)


def _mlp_lnfold_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       gn_ref, bn_ref, o_ref, y_ref):
    """mlp_block + emit y = LN_next(out) (second output)."""
    x = x_ref[0]
    y = _ln(x.astype(jnp.float32), g_ref, be_ref).astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h / _SQRT2))
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    out = x + o.astype(x.dtype)
    o_ref[0] = out
    # the fold: LN of the fresh out while it is in VMEM, next layer's params
    y_ref[0] = _ln(out.astype(jnp.float32), gn_ref, bn_ref).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=())
def mlp_lnfold(x, gamma, beta, w1, b1, w2, b2, gn, bn):
    d, hd = D, HDIM
    w_specs = [pl.BlockSpec(s, lambda i: (0, 0)) for s in
               ((1, d), (1, d), (d, hd), (1, hd), (hd, d), (1, d),
                (1, d), (1, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hd),
            w2, b2.reshape(1, d), gn.reshape(1, d), bn.reshape(1, d))
    return pl.pallas_call(
        _mlp_lnfold_kernel,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 2,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, N, d), lambda i: (i, 0, 0))] + w_specs,
        out_specs=[pl.BlockSpec((1, N, d), lambda i: (i, 0, 0))] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, *flat)


def _attn_prenormed_kernel(x_ref, y_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                           o_ref, attn_scratch, s_scratch, *,
                           num_heads: int, dim: int, scale: float):
    """attn_half with the LN already done (y input) — phase-batched like
    ops/block_attention._attn_half_kernel."""
    dh = dim // num_heads
    x = x_ref[0]
    y = y_ref[0]
    qkv = jax.lax.dot_general(y, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    s = s_scratch[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * _LOG2E)
    l = jnp.sum(e, axis=-1, keepdims=True)
    s_scratch[...] = e
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        o = jax.lax.dot_general(
            s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
    out = jax.lax.dot_general(attn_scratch[...], wp_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = x + (out + bp_ref[...].astype(jnp.float32)).astype(x.dtype)


@jax.jit
def attn_prenormed(x, y, wqkv, bqkv, wproj, bproj):
    d = D
    scale = (d // H) ** -0.5
    kern = functools.partial(_attn_prenormed_kernel, num_heads=H, dim=d,
                             scale=scale)
    w_specs = [pl.BlockSpec(s, lambda i: (0, 0)) for s in
               ((d, 3 * d), (1, 3 * d), (d, d), (1, d))]
    flat = (wqkv, bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, N, d), lambda i: (i, 0, 0))] * 2 + w_specs,
        out_specs=pl.BlockSpec((1, N, d), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((N, d), jnp.bfloat16),
            pltpu.VMEM((H, N, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, y, *flat)


def main():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 12)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    gamma = jnp.ones((D,), dt); beta = jnp.zeros((D,), dt)
    gn = jnp.ones((D,), dt); bn = jnp.zeros((D,), dt)
    w1 = jax.random.normal(ks[1], (D, HDIM), dt) * 0.02
    b1 = jnp.zeros((HDIM,), dt)
    w2 = jax.random.normal(ks[2], (HDIM, D), dt) * 0.02
    b2 = jnp.zeros((D,), dt)
    wqkv = jax.random.normal(ks[3], (D, 3 * D), dt) * 0.02
    bqkv = jnp.zeros((3 * D,), dt)
    wproj = jax.random.normal(ks[4], (D, D), dt) * 0.02
    bproj = jnp.zeros((D,), dt)

    # A: current pair — mlp_block (with residual) then attn_half (does LN)
    @jax.jit
    def pair_a(x):
        h = _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2,
                           interpret=INTERPRET)
        return _attn_half_fwd(h, gn, bn, wqkv, bqkv, wproj, bproj, H,
                              (D // H) ** -0.5, interpret=INTERPRET)

    # B: folded pair — mlp emits (out, LN_next(out)); attn takes both
    @jax.jit
    def pair_b(x):
        h, y = mlp_lnfold(x, gamma, beta, w1, b1, w2, b2, gn, bn)
        return attn_prenormed(h, y, wqkv, bqkv, wproj, bproj)

    # numerics check (bf16 tolerance)
    a = np.asarray(pair_a(x).astype(jnp.float32))
    b = np.asarray(pair_b(x).astype(jnp.float32))
    denom = np.abs(a).max()
    print(f"max rel diff A vs B: {np.abs(a - b).max() / denom:.3e}")

    def bench(f, iters=ITERS):
        out = f(x)
        float(jnp.sum(out.astype(jnp.float32)))  # sync (tunnel: host read)
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = f(o)
        float(jnp.sum(o.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    ta = bench(pair_a)
    tb = bench(pair_b)
    print(f"pair A (current, attn does LN):   {ta:.3f} ms/layer-pair")
    print(f"pair B (LN folded into MLP tail): {tb:.3f} ms/layer-pair")
    print(f"delta: {(ta - tb) / ta * 100:+.2f}% "
          f"({'FOLD WINS' if tb < ta * 0.995 else 'no win — record negative'})")


if __name__ == "__main__":
    main()
