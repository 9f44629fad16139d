"""Interleaved A/B of the task-batched decoder tails in the pretraining step.

VERDICT r4 weak #4: the three SpatialOutputAdapters (identical dim 256 /
depth 2 / heads 8 tails) run ~12 sub-millisecond custom calls ≈ 18 ms/step,
the largest non-floor component of the r4 trace. batched_spatial_decode
stacks the tails on a leading task axis and vmaps — one kernel dispatch per
op with a 3x grid.

Build both steps in one process (mirage._DEC_BATCH toggled at trace time),
time in alternating ABBA rounds so host noise hits both arms equally.

Usage: python scripts/bench_decbatch_ab.py [rounds] [iters] [size] [batch]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def main(rounds=6, iters=10, size="base", B=256):
    from __graft_entry__ import _build_mirage
    import mirage_tpu.models.mirage as mm
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    model = _build_mirage(size, img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    object.__setattr__(model, "remat", True)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
    dc = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "bscanlayermap": {"loss": "ce", "patch_size": 8}}
    loss_fn = make_pretrain_loss(model, dc, num_encoded_tokens=98, alphas=1.0)
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "slo": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "bscanlayermap": jnp.asarray(
                 rng.integers(0, 13, (B, 128, 128)), jnp.int32)}

    steps = {}
    for arm in ("batched", "pertask"):
        mm._DEC_BATCH = arm == "batched"
        steps[arm] = make_train_step(loss_fn, opt, donate=False)
        state = init_train_state(params, opt)
        t0 = time.perf_counter()
        state, m = steps[arm](state, batch, jax.random.PRNGKey(0), 1e-4, 1.0)
        l0 = float(m["loss"])
        print(f"[{arm}] compile+first {time.perf_counter()-t0:.1f}s "
              f"loss {l0:.4f}", flush=True)
        assert np.isfinite(l0)
        steps[arm + "_state"] = state

    results = {"batched": [], "pertask": []}
    order = ["batched", "pertask", "pertask", "batched"]
    for r in range(rounds):
        arm = order[r % len(order)]
        state, step = steps[arm + "_state"], steps[arm]
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch,
                            jax.random.fold_in(jax.random.PRNGKey(1), i),
                            1e-4, 1.0)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        results[arm].append(dt)
        print(f"round {r} [{arm}]: {dt*1e3:.2f} ms/step  {B/dt:.1f} img/s",
              flush=True)

    for arm in results:
        best = min(results[arm])
        med = sorted(results[arm])[len(results[arm]) // 2]
        print(f"{arm}: median {med*1e3:.2f} ms ({B/med:.1f} img/s), "
              f"best {best*1e3:.2f} ms ({B/best:.1f} img/s)", flush=True)
    mb, mp = min(results["batched"]), min(results["pertask"])
    print(f"decoder task-batching delta: {(mp-mb)*1e3:+.2f} ms/step "
          f"({100*(mp/mb-1):+.2f}% batched->pertask)", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if len(a) > 0 else 6, int(a[1]) if len(a) > 1 else 10,
         a[2] if len(a) > 2 else "base", int(a[3]) if len(a) > 3 else 256)
