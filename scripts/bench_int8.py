"""Micro: int8 vs bf16 matmul throughput on the v5e MXU.

v5e datasheet: 197 TFLOP/s bf16, 394 TOPS int8. This measures whether XLA
actually doubles through jnp.dot(int8, int8, preferred_element_type=int32)
at the flagship shapes, to decide if a quantized serving path is worth
building. Timing: chained dispatch through an accumulator, one host sync
(block_until_ready is a no-op through the tunnel — see bench.py).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import functools


def time_matmul(m, k, n, dtype, iters=30):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        pref = jnp.int32
    else:
        x = jnp.asarray(rng.standard_normal((m, k)), dtype)
        w = jnp.asarray(rng.standard_normal((k, n)), dtype)
        pref = jnp.float32

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(x, w, steps):
        def body(c, _):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pref)
            # fold the output back into x's dtype so the chain can't be DCE'd
            c = c + y[0, :1].astype(jnp.float32)
            return c, None
        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                            length=steps)
        return c

    float(chain(x, w, 2)[0])  # compile + warm
    t0 = time.perf_counter()
    float(chain(x, w, iters)[0])
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * m * k * n
    return dt, flops / dt / 1e12


def probe_pallas_int8(m=16384, k=1024, n=4096, blk=512):
    """Does Mosaic lower an (s8, s8) -> s32 dot on this chip, and at what
    rate? Row-blocked grid, weights VMEM-resident (the shape the quantized
    MLP kernel would use). Any compile error means the quantized path must
    stay XLA-side."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(m // blk,),
        in_specs=[pl.BlockSpec((blk, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024))
    try:
        out = call(x, w)
        ref = jnp.dot(x.astype(jnp.int32), w.astype(jnp.int32))
        ok = bool(jnp.all(out == ref))
        print(f"pallas int8 dot: compiles, exact={ok}", flush=True)
        if ok:
            @functools.partial(jax.jit, static_argnames=("steps",))
            def chain(x, w, steps):
                def body(c, _):
                    y = call(x, w)
                    return c + y[0, :1], None
                c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.int32), None,
                                    length=steps)
                return c
            int(chain(x, w, 2)[0])
            t0 = time.perf_counter()
            int(chain(x, w, 30)[0])
            dt = (time.perf_counter() - t0) / 30
            print(f"pallas int8 dot: {dt*1e3:.3f} ms"
                  f" {2*m*k*n/dt/1e12:.1f} TOP/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas int8 dot: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    shapes = [
        (512 * 257, 1024, 4096),   # flagship MLP fc1 at batch 512
        (512 * 257, 4096, 1024),   # fc2
        (512 * 257, 1024, 3072),   # qkv
        (16384, 8192, 8192),       # big square sanity point
    ]
    for m, k, n in shapes:
        dt_b, tf_b = time_matmul(m, k, n, jnp.bfloat16)
        dt_i, tf_i = time_matmul(m, k, n, jnp.int8)
        print(f"({m},{k})x({k},{n}): bf16 {dt_b*1e3:7.2f} ms {tf_b:6.1f} TF/s"
              f" | int8 {dt_i*1e3:7.2f} ms {tf_i:6.1f} TOP/s"
              f" | speedup {dt_b/dt_i:.2f}x", flush=True)
    probe_pallas_int8()
