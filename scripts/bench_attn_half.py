"""A/B: current per-head attn_half kernel vs 3-phase variant (all scores ->
one softmax -> all PV) on the flagship shape, chained in one jit."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirage_tpu.ops.block_attention import _attn_half_fwd

REPS = 24


def _v2_kernel(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
               o_ref, attn_scratch, s_scratch, *, num_heads, dim, scale):
    x = x_ref[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = (y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    qkv = jax.lax.dot_general(y, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    dh = dim // num_heads
    # phase 1: all score matmuls
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    # phase 2: one big softmax (unnormalized) over all heads
    s = s_scratch[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    s_scratch[...] = e
    # phase 3: all PV matmuls + normalize
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


def v2_call(x, gamma, beta, wqkv, bqkv, wproj, bproj, num_heads, scale):
    b, n, d = x.shape
    kernel = functools.partial(_v2_kernel, num_heads=num_heads, dim=d, scale=scale)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
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


def chain(fn, x0, args):
    def body(i, x):
        return fn(x, *args)
    return jax.lax.fori_loop(0, REPS, body, x0)


def bench(tag, fn, x, args, iters=10):
    f = jax.jit(lambda x0: chain(fn, x0, args))
    float(jnp.sum(f(x).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = x
    for _ in range(iters):
        out = f(out)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{tag}: {(time.perf_counter()-t0)/iters/REPS*1e3:.4f} ms/layer", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    b, n, h, d = 64, 257, 16, 1024
    scale = (d // h) ** -0.5
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.1, jnp.bfloat16)
    gamma = jnp.ones((d,), jnp.bfloat16); beta = jnp.zeros((d,), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * d,), jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((d, d)) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((d,), jnp.bfloat16)
    args = (gamma, beta, wqkv, bqkv, wproj, bproj)
    f1 = lambda x, *a: _attn_half_fwd(x, *a, h, scale)
    f2 = lambda x, *a: v2_call(x, *a, h, scale)
    # correctness first
    o1 = f1(x, *args); o2 = f2(x, *args)
    print("v1-v2 maxdiff:", float(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)).max()), flush=True)
    bench("v1 per-head", f1, x, args)
    bench("v2 3-phase ", f2, x, args)
