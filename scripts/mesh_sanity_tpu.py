"""One-chip mesh= sanity on real TPU (VERDICT r3 task #2).

Proves the shard_map serving/training composition compiles and runs with the
REAL Mosaic kernels on hardware: builds a 1-device Mesh over the single v5e
chip, runs (a) MIRAGEWrapper(mesh=...) flagship-shape inference with
attn_impl='auto' (kernels engaged inside shard_map) vs mesh=None, and (b)
one dp shard_map pretrain step, checking outputs match/are finite. On a
multi-chip host the same code exercises the full dp fan-out.

Run: python scripts/mesh_sanity_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()  # JAX_PLATFORMS=cpu + MIRAGE_PALLAS=interpret = CPU smoke

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_mirage

# Chip defaults; env knobs so the whole script can be smoke-run on the CPU
# mesh (tiny preset, interpret kernels) before burning a chip window.
PRESET = os.environ.get("MESH_SANITY_PRESET", "large")
IMG = int(os.environ.get("MESH_SANITY_IMG", 512))
BPD = int(os.environ.get("MESH_SANITY_BPD", 8))  # serving batch per device
ITERS = int(os.environ.get("MESH_SANITY_ITERS", 6))


def main():
    devs = jax.devices()
    print(f"devices: {devs}")

    from mirage_tpu.parallel.mesh import make_mesh, replicate, dp_shard_map
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch,
                                        shard_state)

    n = len(devs)
    mesh = make_mesh({"data": n}, devices=devs)

    # (a) serving: flagship-shape forward, kernels engaged, inside shard_map
    model = _build_mirage(PRESET, img=IMG, layermap=IMG // 4,
                          compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    b = BPD * n
    npt = (IMG // 32) ** 2  # all tasks share the 16x16 grid at IMG=512
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((b, 1, IMG, IMG)), jnp.float32),
         "slo": jnp.zeros((b, 1, IMG, IMG), jnp.float32),
         "bscanlayermap": jnp.zeros((b, IMG // 4, IMG // 4), jnp.int32)}
    masks = {"bscan": jnp.zeros((b, npt), jnp.int32),
             "slo": jnp.ones((b, npt), jnp.int32),
             "bscanlayermap": jnp.ones((b, npt), jnp.int32)}

    def fwd(p, x, masks):
        preds, _ = model(p, x, mask_inputs=False, task_masks=masks,
                         num_visible=npt, deterministic=True,
                         absent_tasks=("slo", "bscanlayermap"))
        return preds

    t0 = time.time()
    ref = jax.jit(fwd)(params, x, masks)
    ref_b = np.asarray(ref["bscan"].astype(jnp.float32))
    print(f"plain jit forward ok ({time.time()-t0:.1f}s compile+run)")

    from jax.sharding import NamedSharding, PartitionSpec as P

    sm = jax.jit(dp_shard_map(fwd, mesh, n_batch_args=2, axes=("data",)))
    place = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1))))), t)
    t0 = time.time()
    got = sm(replicate(params, mesh), place(x), place(masks))
    got_b = np.asarray(got["bscan"].astype(jnp.float32))
    # Norm-relative: the kernels route by LOCAL batch (elems/block pickers),
    # so per-device accumulation order differs from the full-batch plain jit
    # — bf16-ULP-level diffs are expected, not a correctness signal.
    rel = np.abs(got_b - ref_b).max() / (1e-3 + np.abs(ref_b).max())
    print(f"shard_map forward ok ({time.time()-t0:.1f}s compile+run); "
          f"max|diff| vs plain jit = {np.abs(got_b - ref_b).max():.3e} "
          f"(norm-rel {rel:.3e}, max|ref| {np.abs(ref_b).max():.3e})")
    assert rel < 3e-2, "serving mismatch"

    # quick relative timing (serving overhead of the shard_map wrapper).
    # Warm with a HOST READ — block_until_ready is a no-op on the tunneled
    # platform, so without it the timed loop absorbs the compile/backlog
    # (the r4 run printed a bogus 5x shard_map 'overhead' that a proper
    # chained bench, scripts/bench_shardmap_overhead.py, measured at ~3.5%)
    def timeit(f, *a, iters=ITERS):
        out = f(*a)  # warm: compile + drain, synced by the host read below
        float(jnp.sum(out["bscan"].astype(jnp.float32))
              if isinstance(out, dict) else jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        # host read = the only real sync on the tunneled platform
        s = float(sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
                  if isinstance(out, dict) else jnp.sum(out))
        del s
        return (time.perf_counter() - t0) / iters

    t_plain = timeit(jax.jit(fwd), params, x, masks)
    t_sm = timeit(sm, replicate(params, mesh), place(x), place(masks))
    print(f"per-batch: plain jit {t_plain*1e3:.1f} ms, shard_map "
          f"{t_sm*1e3:.1f} ms (batch {b})")

    # (b) one dp shard_map pretrain step with kernels engaged
    tr = _build_mirage(os.environ.get("MESH_SANITY_TRAIN_PRESET", "base"),
                       img=128, layermap=32)
    tp = tr.init_params(jax.random.PRNGKey(1))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0,
        layer_decay=0.75, num_layers=tr.depth))
    conf = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
            "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
            "bscanlayermap": {"loss": "ce", "patch_size": 8}}
    loss_fn = make_pretrain_loss(tr, conf, num_encoded_tokens=12, alphas=1.0)
    # force the shard_map dp step even on a 1-device mesh (make_train_step
    # deliberately falls back to plain jit there) — this run exists to prove
    # kernels ∘ shard_map compile on hardware
    from mirage_tpu.train.steps import _make_dp_train_step

    step = _make_dp_train_step(loss_fn, opt, mesh, donate=False)
    bt = 4 * n
    batch = {"bscan": jnp.asarray(rng.random((bt, 1, 128, 128)), jnp.float32),
             "slo": jnp.asarray(rng.random((bt, 1, 128, 128)), jnp.float32),
             "bscanlayermap": jnp.asarray(
                 rng.integers(0, 13, (bt, 32, 32)), jnp.int32)}
    state = shard_state(init_train_state(tp, opt), mesh)
    with mesh:
        state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(2), 1e-4, 1.0)
    loss = float(metrics["loss"])
    print(f"dp shard_map train step: loss={loss:.4f} "
          f"grad_norm={float(metrics['grad_norm']):.4f}")
    assert np.isfinite(loss)
    print("MESH SANITY OK")


if __name__ == "__main__":
    main()
