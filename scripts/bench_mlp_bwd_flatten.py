"""A/B: pad-to-112 vs exact-flatten routing for the MLP backward at the
pretraining shape (256, 99, 768).

The pad path (fused_mlp._mlp_block_bwd_pallas) copies (B,99,D)->(B,112,D)
(jnp.pad) and runs 28672 rows — 13% of them zero-cotangent waste (~6 ms of
the 47 ms MLP-bwd budget at the step level). Total real rows 256*99=25344
are 256-divisible, so a ragged reshape (also one copy) runs exactly 99
row-blocks of 256. This times both end-to-end including their copies.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.ops.fused_mlp import _mlp_block_bwd_pallas


def main():
    b, n, d, hdim = 256, 99, 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, hdim)) * 0.02, jnp.float32)
    b1 = jnp.zeros((hdim,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hdim, d)) * 0.02, jnp.float32)

    n_pad = -(-n // 16) * 16

    @jax.jit
    def via_pad(x, dy):
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        dyp = jnp.pad(dy, ((0, 0), (0, n_pad - n), (0, 0)))
        out = _mlp_block_bwd_pallas(xp.reshape(b * n_pad, d),
                                    dyp.reshape(b * n_pad, d),
                                    gamma, beta, w1, b1, w2)
        return (out[0].reshape(b, n_pad, d)[:, :n],) + out[1:]

    @jax.jit
    def via_flat(x, dy):
        out = _mlp_block_bwd_pallas(x.reshape(b * n, d), dy.reshape(b * n, d),
                                    gamma, beta, w1, b1, w2)
        return (out[0].reshape(b, n, d),) + out[1:]

    def time_fn(fn, iters=30):
        outs = fn(x, dy)
        jax.block_until_ready(outs)
        float(jnp.sum(outs[0].astype(jnp.float32)))  # host sync
        # chain through dy so dispatches serialize
        t0 = time.perf_counter()
        acc = dy
        for _ in range(iters):
            outs = fn(x, acc)
            acc = outs[0].astype(jnp.bfloat16)
        float(jnp.sum(acc.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    # parity first
    got_p = via_pad(x, dy)
    got_f = via_flat(x, dy)
    for a, b_ in zip(got_p, got_f):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-2, atol=2e-2)
    print("parity ok", flush=True)
    t_pad = time_fn(via_pad)
    t_flat = time_fn(via_flat)
    print(f"pad-to-{n_pad}: {t_pad*1e3:.3f} ms/layer-bwd", flush=True)
    print(f"exact-flatten: {t_flat*1e3:.3f} ms/layer-bwd "
          f"({(t_pad-t_flat)*1e3:+.3f} ms, x12 layers = "
          f"{(t_pad-t_flat)*12e3:+.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
