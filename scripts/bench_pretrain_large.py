"""MIRAGE-Large pretraining step on the chip (reference Large preset:
dim 1024, depth 24, 16 heads — run_pretraining.py model registry).

Exists to (a) pin that the d=1024/hdim=4096 MLP backward compiles on TPU —
its fixed weight+accumulator VMEM term (~50 MB) busts the 48 MB block
budget, so the picker must take the tier-2 ceiling path (fused_mlp.py
_pick_bwd_block) — and (b) record a Large-pretraining throughput row.

Usage: python scripts/bench_pretrain_large.py [batch]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def main(B=128):
    from __graft_entry__ import _build_mirage
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    model = _build_mirage("large", img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    object.__setattr__(model, "remat", True)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
    dc = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "bscanlayermap": {"loss": "ce", "patch_size": 8}}
    loss_fn = make_pretrain_loss(model, dc, num_encoded_tokens=98, alphas=1.0,
                                 sample_tasks_uniformly=False)
    step = make_train_step(loss_fn, opt)
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "slo": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "bscanlayermap": jnp.asarray(
                 rng.integers(0, 13, (B, 128, 128)), jnp.int32)}
    state = init_train_state(params, opt)
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0), 1e-4, 1.0)
    loss0 = float(m["loss"])  # compile + sync
    print(f"compile+first step {time.perf_counter()-t0:.1f}s  loss {loss0:.4f}"
          f"  grad_norm {float(m['grad_norm']):.4f}", flush=True)
    assert np.isfinite(loss0)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch,
                        jax.random.fold_in(jax.random.PRNGKey(1), i), 1e-4, 1.0)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"pretrain_vitl_img_per_sec: {dt*1e3:.1f} ms/step  {B/dt:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
