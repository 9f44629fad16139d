"""Chained-in-jit micro-bench: block kernel variants vs XLA attention."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirage_tpu.ops.block_attention import _block_attn_kernel, _attn_xla

REPS = 24  # chain like 24 encoder layers


def make_block(semantics):
    def call(qkv, num_heads, scale):
        b, n, three_d = qkv.shape
        dim = three_d // 3
        kernel = functools.partial(_block_attn_kernel, num_heads=num_heads,
                                   dim=dim, scale=scale)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, three_d), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,)),
        )(qkv)
    return call


def chain(attn_fn, qkv0, w, num_heads, scale):
    """REPS x (attention -> re-project out to 3D with a fixed weight) inside
    one jit, so device work chains with no host round trips."""
    def body(i, qkv):
        o = attn_fn(qkv, num_heads, scale)
        return jnp.einsum("bnd,dk->bnk", o, w).astype(qkv.dtype)
    return jax.lax.fori_loop(0, REPS, body, qkv0)


def bench(tag, fn, *args, iters=10):
    f = jax.jit(fn)
    float(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = None
    out = args[0]
    for _ in range(iters):
        out = f(out, *args[1:])
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"{tag}: {dt*1e3:.4f} ms/attention-layer", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    b, n, h, d = 48, 257, 16, 1024
    scale = (d // h) ** -0.5
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.01, jnp.bfloat16)
    print("devices:", jax.devices(), flush=True)
    bench("xla      ", lambda q, w_: chain(_attn_xla, q, w_, h, scale), qkv, w)
    bench("block/arb", lambda q, w_: chain(make_block("arbitrary"), q, w_, h, scale), qkv, w)
    bench("block/par", lambda q, w_: chain(make_block("parallel"), q, w_, h, scale), qkv, w)
