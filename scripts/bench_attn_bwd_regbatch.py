"""3-way A/B on the attn-half backward at the pretraining shape
(256, 99, 768, 12 heads):

  1. current: per-element VMEM accumulator updates (sequential grid)
  2. reg_batch: register-sum the elems=4 elements' grads, one accumulator
     update per program (still sequential)
  3. defused: dx-only kernel on a PARALLEL grid; y/dqkv/attn materialized,
     weight-grad contractions in XLA (_attn_half_bwd_defused)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.ops.block_attention import (_attn_half_bwd_defused,
                                            _attn_half_bwd_pallas)


def main():
    b, n, d, heads = 256, 99, 768, 12
    scale = (d // heads) ** -0.5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wp = jnp.asarray(rng.standard_normal((d, d)) * 0.02, jnp.float32)

    def make(reg_batch):
        @jax.jit
        def fn(x, dy):
            return _attn_half_bwd_pallas(x, dy, gamma, beta, wqkv, bqkv, wp,
                                         heads, scale, reg_batch=reg_batch)
        return fn

    f_per, f_reg = make(False), make(True)

    def time_fn(fn, iters=30):
        outs = fn(x, dy)
        float(jnp.sum(outs[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = dy
        for _ in range(iters):
            outs = fn(x, acc)
            acc = outs[0].astype(jnp.bfloat16)
        float(jnp.sum(acc.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def f_def(x, dy):
        return _attn_half_bwd_defused(x, dy, gamma, beta, wqkv, bqkv, wp,
                                      heads, scale)

    got_a = f_per(x, dy)
    for tag, fn, tol in (("reg_batch", f_reg, 3e-3), ("defused", f_def, 3e-2)):
        got = fn(x, dy)
        for i, (a, c) in enumerate(zip(got_a, got)):
            a = np.asarray(a, np.float32)
            c = np.asarray(c, np.float32)
            rel = np.max(np.abs(a - c)) / (1e-3 + np.max(np.abs(c)))
            assert rel < tol, f"{tag} output {i}: norm-rel err {rel:.5f}"
    print("parity ok", flush=True)
    t_per = time_fn(f_per)
    print(f"per-element accumulate: {t_per*1e3:7.3f} ms/layer", flush=True)
    t_reg = time_fn(f_reg)
    print(f"register-batched:       {t_reg*1e3:7.3f} ms/layer "
          f"({(t_per-t_reg)*1e3:+.3f} ms, x12 = {(t_per-t_reg)*12e3:+.1f} "
          "ms/step)", flush=True)
    t_def = time_fn(f_def)
    print(f"defused (parallel+XLA): {t_def*1e3:7.3f} ms/layer "
          f"({(t_per-t_def)*1e3:+.3f} ms, x12 = {(t_per-t_def)*12e3:+.1f} "
          "ms/step)", flush=True)


if __name__ == "__main__":
    main()
