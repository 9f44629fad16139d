"""A/B: stash (4-matmul, transcendental-free) vs recompute MLP backward at
the PRETRAINING encoder shape (256, 99, 768)x3072 — the stash-under-remat
question the round-3 economics note deferred.

The toy remat experiment (custom_vjp + checkpoint_name residuals register
with save_only_these_names) makes the stash viable under the encoder's
selective remat: the fwd scan writes act+gelu', the policy saves them, and
the bwd-scan recompute is DCE'd. This measures whether the kernel economics
pay at d=768 before plumbing it through the encoder:

  A  current routing: exact-flatten recompute bwd (round-3 winner, 5.10)
  B  stash bwd, pre-flattened stashes (kernel best case)
  C  3-D fwd plain vs 3-D fwd stash (overhead of the two stash writes +
     gelu' pass), plus the stash_flat variant (misaligned-row direct-to-flat
     stash blocks — compile probe)
  D  relayout cost of (B,99,H)->(B*99,H) for the stashes
  E  end-to-end pair: fwd_stash3d + reshape + bwd_stash  vs  fwd + bwd_flat
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.ops.fused_mlp import (
    _mlp_block_bwd_pallas, _mlp_block_bwd_stash, _mlp_block_fwd,
    _mlp_block_fwd_stash3d)


def time_fn(fn, x, dy, iters=30):
    outs = fn(x, dy)
    jax.block_until_ready(outs)
    first = outs[0] if isinstance(outs, (tuple, list)) else outs
    float(jnp.sum(first.astype(jnp.float32)))  # host sync
    t0 = time.perf_counter()
    acc = dy
    for _ in range(iters):
        outs = fn(x, acc)
        first = outs[0] if isinstance(outs, (tuple, list)) else outs
        acc = first.astype(jnp.bfloat16)
    float(jnp.sum(acc.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


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
    b2 = jnp.zeros((d,), jnp.float32)

    @jax.jit
    def fwd_plain(x, _):
        return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2)

    @jax.jit
    def fwd_stash3d(x, _):
        return _mlp_block_fwd_stash3d(x, gamma, beta, w1, b1, w2, b2)

    @jax.jit
    def fwd_stash_flat(x, _):
        return _mlp_block_fwd_stash3d(x, gamma, beta, w1, b1, w2, b2,
                                      stash_flat=True)

    @jax.jit
    def bwd_flat_recompute(x, dy):
        out = _mlp_block_bwd_pallas(x.reshape(b * n, d), dy.reshape(b * n, d),
                                    gamma, beta, w1, b1, w2)
        return (out[0].reshape(b, n, d),) + out[1:]

    # stash bwd with PRE-FLATTENED stashes (kernel best case). The stashes
    # must be ARGUMENTS, not jit closure constants — 156 MB constants blow
    # the remote-compile request-body limit (HTTP 413 through the tunnel).
    out3, act3, dg3 = fwd_stash3d(x, None)
    act_f = jnp.reshape(act3, (b * n, hdim)).block_until_ready()
    dg_f = jnp.reshape(dg3, (b * n, hdim)).block_until_ready()

    @jax.jit
    def _bwd_stash_preflat(x, dy, act_f, dg_f):
        out = _mlp_block_bwd_stash(x.reshape(b * n, d), dy.reshape(b * n, d),
                                   act_f, dg_f, gamma, beta, w1, w2)
        return (out[0].reshape(b, n, d),) + out[1:]

    def bwd_stash_preflat(x, dy):
        return _bwd_stash_preflat(x, dy, act_f, dg_f)

    @jax.jit
    def e2e_stash(x, dy):
        out, act, dg = _mlp_block_fwd_stash3d(x, gamma, beta, w1, b1, w2, b2)
        g = _mlp_block_bwd_stash(x.reshape(b * n, d), dy.reshape(b * n, d),
                                 act.reshape(b * n, hdim),
                                 dg.reshape(b * n, hdim), gamma, beta, w1, w2)
        return (g[0].reshape(b, n, d) + out,) + g[1:]

    @jax.jit
    def e2e_recompute(x, dy):
        out = _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2)
        g = _mlp_block_bwd_pallas(x.reshape(b * n, d), dy.reshape(b * n, d),
                                  gamma, beta, w1, b1, w2)
        return (g[0].reshape(b, n, d) + out,) + g[1:]

    # --- parity: stash fwd out == plain fwd; stash bwd grads ~= recompute
    np.testing.assert_array_equal(np.asarray(fwd_plain(x, None), np.float32),
                                  np.asarray(out3, np.float32))
    got_r = bwd_flat_recompute(x, dy)
    got_s = bwd_stash_preflat(x, dy)
    for i, (a, c) in enumerate(zip(got_r, got_s)):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        # norm-relative: the stash bwd uses the bf16 gelu' stash where the
        # recompute bwd re-derives it in f32 — parameter-grad SUMS over 25k
        # rows accumulate ~1% differences (bf16-rounding scale), which is
        # training noise, not error
        rel = np.max(np.abs(a - c)) / (1e-3 + np.max(np.abs(c)))
        assert rel < 3e-2, f"output {i}: norm-rel err {rel:.4f}"
    print("parity ok", flush=True)

    t = time_fn(fwd_plain, x, dy)
    print(f"C  fwd plain 3-D:          {t*1e3:7.3f} ms/layer", flush=True)
    t_fs = time_fn(fwd_stash3d, x, dy)
    print(f"C  fwd stash 3-D:          {t_fs*1e3:7.3f} ms/layer", flush=True)
    try:
        time_fn(fwd_stash_flat, x, dy, iters=5)
        t_ff = time_fn(fwd_stash_flat, x, dy)
        print(f"C  fwd stash flat-out:     {t_ff*1e3:7.3f} ms/layer",
              flush=True)
    except Exception as e:
        print(f"C  fwd stash flat-out: FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})", flush=True)

    @jax.jit
    def reshape_stash(a, _):
        return a.reshape(b * n, hdim) * 1  # force the relayout copy
    t_rs = time_fn(reshape_stash, act3, act3)
    print(f"D  stash relayout (x1):    {t_rs*1e3:7.3f} ms", flush=True)

    t_a = time_fn(bwd_flat_recompute, x, dy)
    print(f"A  bwd flat recompute:     {t_a*1e3:7.3f} ms/layer", flush=True)
    t_b = time_fn(bwd_stash_preflat, x, dy)
    print(f"B  bwd stash preflat:      {t_b*1e3:7.3f} ms/layer", flush=True)
    t_er = time_fn(e2e_recompute, x, dy)
    t_es = time_fn(e2e_stash, x, dy)
    print(f"E  e2e recompute fwd+bwd:  {t_er*1e3:7.3f} ms/layer", flush=True)
    print(f"E  e2e stash fwd+bwd:      {t_es*1e3:7.3f} ms/layer "
          f"({(t_er-t_es)*1e3:+.3f} ms, x12 = {(t_er-t_es)*12e3:+.1f} ms/step)",
          flush=True)


if __name__ == "__main__":
    main()
