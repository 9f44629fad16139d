"""Micro-benchmark: block-attention kernel vs XLA path on the real chip.

Times the isolated attention op at the flagship shapes and the full
MIRAGE-Large inference model with attn_impl in {auto(block), xla}.
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    acc = fn(*args)               # compile+warm
    float(jnp.sum(acc))
    t0 = time.perf_counter()
    accs = []
    for _ in range(iters):
        accs.append(fn(*args))
    float(sum(jnp.sum(a) for a in accs))
    return (time.perf_counter() - t0) / iters


def attn_micro():
    from mirage_tpu.ops.block_attention import block_attention, _attn_xla

    rng = np.random.default_rng(0)
    for (b, n, h, d) in [(48, 257, 16, 1024), (256, 99, 12, 768)]:
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.bfloat16)
        scale = (d // h) ** -0.5
        f_blk = jax.jit(lambda t: block_attention(t, h, scale))
        f_xla = jax.jit(lambda t: _attn_xla(t, h, scale))
        tb = timeit(f_blk, qkv)
        tx = timeit(f_xla, qkv)
        print(f"B={b} N={n} H={h} D={d}: block {tb*1e3:.3f} ms  xla {tx*1e3:.3f} ms  "
              f"(x{tx/tb:.2f})", flush=True)


def model_bench(impl):
    from __graft_entry__ import _build_mirage

    model = _build_mirage("large", img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    object.__setattr__(model, "attn_impl", impl)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    B = 48
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.zeros((B, 1, 512, 512), jnp.float32),
         "bscanlayermap": jnp.zeros((B, 128, 128), jnp.int32)}
    masks = {"bscan": jnp.zeros((B, 256), jnp.int32),
             "slo": jnp.ones((B, 256), jnp.int32),
             "bscanlayermap": jnp.ones((B, 256), jnp.int32)}

    @jax.jit
    def fwd(params, x, masks, acc):
        preds, _ = model(params, x, mask_inputs=False, task_masks=masks,
                         num_visible=256, deterministic=True)
        return acc + sum(jnp.sum(p.astype(jnp.float32)) for p in preds.values())

    float(fwd(params, x, masks, jnp.zeros(())))
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    ITERS = 20
    for _ in range(ITERS):
        acc = fwd(params, x, masks, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"model impl={impl}: {dt*1e3:.2f} ms/step  {B/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    attn_micro()
    model_bench("xla")
    model_bench("auto")
