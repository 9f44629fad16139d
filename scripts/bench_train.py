"""Training-step benchmarks at the reference configs (BASELINE.md rows):
pretraining (ViT-B, batch 256, 98/768 tokens, remat), seg tuning (ViT-B
frozen, 1024²/p32, ConvNeXt, batch 8 — both the reference-parity freeze,
where input adapters train through the frozen encoder, and the
--freeze_input_adapters fast path), cls tuning (ViT-B, 512²/p32, global
pool, batch 64, probe + full FT). Timings: chained dispatch, one host sync.

--json PATH writes one JSON object per workload (list) for the round
artifacts (BENCH_TRAIN_r*.json); stdout always gets the human lines.
"""
import argparse
import functools
import json
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def timestep(step, state, batch, iters=10, lr=1e-4):
    state, m = step(state, batch, jax.random.PRNGKey(0), lr, 1.0)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i), lr, 1.0)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def _row(metric, B, dt):
    row = {"metric": metric, "value": round(B / dt, 2), "unit": "images/sec",
           "ms_per_step": round(dt * 1e3, 2), "batch": B}
    print(f"{metric}: {dt*1e3:.1f} ms/step  {B/dt:.1f} img/s", flush=True)
    return row


def bench_pretrain():
    from __graft_entry__ import _build_mirage
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    model = _build_mirage("base", img=512, layermap=128,
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
    B = 256
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "slo": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "bscanlayermap": jnp.asarray(rng.integers(0, 13, (B, 128, 128)), jnp.int32)}
    state = init_train_state(params, opt)
    return _row("pretrain_vitb_img_per_sec", B, timestep(step, state, batch))


def _seg_setup(parity):
    from mirage_tpu.adapters import ConvNeXtAdapter, PatchedInputAdapter
    from mirage_tpu.losses import ce_gdice_loss
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state, make_train_step

    model = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(32, 32), image_size=1024)},
        output_adapters={"semseg": ConvNeXtAdapter(
            num_classes=8, patch_size=32, preds_per_patch=16, depth=4,
            embed_dim=6144, main_tasks=("bscan",), task="semseg",
            image_size=(1024, 1024))},
        dim_tokens=768, depth=12, num_heads=12, drop_path_rate=0.1,
        compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", weight_decay=0.05, layer_decay=0.75,
        num_layers=model.depth, freeze_encoder=True,
        frozen_paths=() if parity else ("input_adapters", "global_tokens")))

    def loss_fn(p, batch, rng):
        preds = model.forward_light(p, {"bscan": batch["bscan"]},
                                    deterministic=False, rng=rng,
                                    frozen_encoder=not parity)
        return ce_gdice_loss(preds["semseg"].astype(jnp.float32),
                             batch["semseg"]), {}

    step = make_train_step(loss_fn, opt)
    state = init_train_state(params, opt)
    return step, state


def bench_seg(parity):
    B = 8
    step, state = _seg_setup(parity)
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 1024, 1024)), jnp.float32),
             "semseg": jnp.asarray(rng.integers(0, 8, (B, 1024, 1024)), jnp.int32)}
    tag = "seg_vitb_frozen_img_per_sec" if parity \
        else "seg_vitb_fullfreeze_img_per_sec"
    return _row(tag, B, timestep(step, state, batch))


def bench_cls(linear_probing, remat):
    from mirage_tpu.losses.gdice import cross_entropy_loss
    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state

    core = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(32, 32), image_size=512)},
        output_adapters=None, dim_tokens=768, depth=12, num_heads=12,
        compute_dtype=jnp.bfloat16, remat=remat)
    params = {"model": core.init_params(jax.random.PRNGKey(0)),
              "norm": layer_norm_init(768),
              "head": {"w": jnp.zeros((768, 5)), "b": jnp.zeros((5,))}}
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", weight_decay=1e-2,
        frozen_paths=("model", "norm") if linear_probing else ()))

    def apply(p, x, rng):
        tokens = core.forward_light(p["model"], {"bscan": x},
                                    deterministic=False, rng=rng,
                                    frozen_encoder=linear_probing)
        pooled = layer_norm(p["norm"], tokens)[:, :-1].mean(axis=1)
        return linear(p["head"], pooled.astype(jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng, lr, wdm):
        def wrapped(p):
            logits = apply(opt.stop_frozen(p), batch["x"], rng)
            return cross_entropy_loss(logits[..., None, None],
                                      batch["y"][..., None, None],
                                      label_smoothing=0.1), {}

        (loss, _), grads = jax.value_and_grad(wrapped, has_aux=True)(state["params"])
        params_, opt_state, gnorm = opt.update(grads, state["opt"],
                                               state["params"], lr)
        return ({"params": params_, "opt": opt_state, "step": state["step"] + 1},
                {"loss": loss, "grad_norm": gnorm})

    B = 64
    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "y": jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)}
    state = init_train_state(params, opt)
    tag = "cls_vitb_probe_img_per_sec" if linear_probing \
        else "cls_vitb_fullft_img_per_sec"
    return _row(tag, B, timestep(step, state, batch))


def run(which="all"):
    rows = []
    if which in ("all", "pretrain"):
        rows.append(bench_pretrain())
    if which in ("all", "seg"):
        rows.append(bench_seg(parity=True))
        rows.append(bench_seg(parity=False))
    if which in ("all", "cls"):
        rows.append(bench_cls(True, False))
        rows.append(bench_cls(False, True))
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all")
    ap.add_argument("--json", default=None, type=str)
    a = ap.parse_args()
    rows = run(a.which)
    if a.json:
        with open(a.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {a.json}")
