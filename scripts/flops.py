"""Counted-FLOP rooflines for the four workloads (VERDICT r2 weak #2: only
inference had honest arithmetic).

Method: XLA `compile().cost_analysis()['flops']` on the CPU backend (the
Pallas kernels only engage on TPU, so the CPU HLO counts every matmul the
XLA fallback path does — same math, and custom-calls would report 0).
`lax.scan` bodies are counted ONCE by cost_analysis, so the encoder scan is
corrected with (depth-1) x per-layer flops, where the per-layer number comes
from compiling one block_apply fwd (and fwd+bwd for training; under remat the
backward body re-runs the forward, so the correction adds fwd again).
Counting runs at a small batch and scales linearly (every op is linear in B).

Usage: python scripts/flops.py [pretrain|seg|cls|infer|all]
Prints GFLOP/image fwd+bwd totals to paste into BASELINE.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

PEAK_TFLOPS = 197.0  # v5e bf16


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def block_layer_flops(dim, heads, n, b, *, train, remat, mlp_ratio=4.0):
    """fwd (and fwd+bwd) flops of ONE encoder block at (b, n, dim)."""
    from mirage_tpu.nn.block import block_apply, block_init

    p = block_init(jax.random.PRNGKey(0), dim, mlp_ratio=mlp_ratio)
    x = jnp.zeros((b, n, dim), jnp.bfloat16)

    fwd = flops_of(lambda p_, x_: block_apply(p_, x_, heads, impl="xla"), p, x)
    if not train:
        return fwd

    def loss(p_, x_):
        return jnp.sum(block_apply(p_, x_, heads, impl="xla")
                       .astype(jnp.float32))

    both = flops_of(lambda p_, x_: jax.grad(loss, argnums=(0, 1))(p_, x_), p, x)
    if remat:
        both += fwd  # backward scan body recomputes the forward
    return both


def report(tag, step_flops, corr, b_count, b_real, dt_ms=None):
    per_img = (step_flops + corr) / b_count
    line = f"{tag}: {per_img / 1e9:.1f} GFLOP/img (counted)"
    if dt_ms is not None:
        tf_s = per_img * b_real / (dt_ms / 1e3) / 1e12
        line += (f"; at {dt_ms} ms/step (B={b_real}) -> {tf_s:.1f} TFLOP/s "
                 f"= {100 * tf_s / PEAK_TFLOPS:.0f}% MFU")
    print(line, flush=True)
    return per_img


def pretrain(dt_ms=None, size="base", b_real=256):
    from __graft_entry__ import _build_mirage
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    B = 8
    model = _build_mirage(size, img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    object.__setattr__(model, "remat", True)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
    dc = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
          "bscanlayermap": {"loss": "ce", "patch_size": 8}}
    loss_fn = make_pretrain_loss(model, dc, num_encoded_tokens=98)
    step = make_train_step(loss_fn, opt, donate=False)
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "slo": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
             "bscanlayermap": jnp.asarray(
                 rng.integers(0, 13, (B, 128, 128)), jnp.int32)}
    state = init_train_state(params, opt)
    f = flops_of(lambda s, bt: step(s, bt, jax.random.PRNGKey(0), 1e-4, 1.0),
                 state, batch)
    lf = block_layer_flops(model.dim_tokens, model.num_heads, 99, B,
                           train=True, remat=True)
    return report(f"pretrain ViT-{size[0].upper()} (98/768 tok, remat, "
                  "fwd+bwd+adamw)", f, (model.depth - 1) * lf, B, b_real,
                  dt_ms)


def seg(dt_ms=None, parity=True):
    from mirage_tpu.adapters import ConvNeXtAdapter, PatchedInputAdapter
    from mirage_tpu.losses import ce_gdice_loss
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state, make_train_step

    B = 2
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
    frozen_paths = () if parity else ("input_adapters", "global_tokens")
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", weight_decay=0.05, layer_decay=0.75,
        num_layers=model.depth, freeze_encoder=True,
        frozen_paths=frozen_paths))

    def loss_fn(p, batch, rng):
        preds = model.forward_light(p, {"bscan": batch["bscan"]},
                                    deterministic=False, rng=rng,
                                    frozen_encoder=not parity)
        return ce_gdice_loss(preds["semseg"].astype(jnp.float32),
                             batch["semseg"]), {}

    step = make_train_step(loss_fn, opt, donate=False)
    rng = np.random.default_rng(0)
    batch = {"bscan": jnp.asarray(rng.random((B, 1, 1024, 1024)), jnp.float32),
             "semseg": jnp.asarray(rng.integers(0, 8, (B, 1024, 1024)), jnp.int32)}
    state = init_train_state(params, opt)
    f = flops_of(lambda s, bt: step(s, bt, jax.random.PRNGKey(0), 1e-4, 1.0),
                 state, batch)
    # frozen encoder: fwd always; + activation-backward when parity (the
    # adapters need dX through the blocks). drop_path 0.1 threads per-layer
    # rates but flops are rate-independent.
    if parity:
        lf = block_layer_flops(768, 12, 1025, B, train=True, remat=False)
    else:
        lf = block_layer_flops(768, 12, 1025, B, train=False, remat=False)
    tag = "seg ViT-B frozen" + (" (parity: adapters train)" if parity
                                else " (fast path: full freeze)")
    return report(tag, f, (model.depth - 1) * lf, B, 8, dt_ms)


def cls(dt_ms_probe=None, dt_ms_ft=None):
    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.losses.gdice import cross_entropy_loss
    from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state

    B = 8
    out = []
    for probe, remat, dt in ((True, False, dt_ms_probe), (False, True, dt_ms_ft)):
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
            frozen_paths=("model", "norm") if probe else ()))

        def apply(p, x, rng):
            tokens = core.forward_light(p["model"], {"bscan": x},
                                        deterministic=False, rng=rng,
                                        frozen_encoder=probe)
            pooled = layer_norm(p["norm"], tokens)[:, :-1].mean(axis=1)
            return linear(p["head"], pooled.astype(jnp.float32))

        def step(state, batch, rng):
            def wrapped(p):
                logits = apply(opt.stop_frozen(p), batch["x"], rng)
                return cross_entropy_loss(logits[..., None, None],
                                          batch["y"][..., None, None],
                                          label_smoothing=0.1)

            loss, grads = jax.value_and_grad(wrapped)(state["params"])
            p2, o2, g = opt.update(grads, state["opt"], state["params"], 1e-3)
            return loss

        rng = np.random.default_rng(0)
        batch = {"x": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
                 "y": jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)}
        state = init_train_state(params, opt)
        f = flops_of(lambda s, bt: step(s, bt, jax.random.PRNGKey(0)),
                     state, batch)
        lf = block_layer_flops(768, 12, 257, B, train=not probe, remat=remat)
        tag = "cls ViT-B " + ("probe (frozen fwd only)" if probe
                              else "full-FT (remat)")
        out.append(report(tag, f, (core.depth - 1) * lf, B, 64, dt))
    return out


def infer(dt_ms=None):
    from __graft_entry__ import _build_mirage

    B = 8
    model = _build_mirage("large", img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.zeros((B, 1, 512, 512), jnp.float32),
         "bscanlayermap": jnp.zeros((B, 128, 128), jnp.int32)}
    masks = {"bscan": jnp.zeros((B, 256), jnp.int32),
             "slo": jnp.ones((B, 256), jnp.int32),
             "bscanlayermap": jnp.ones((B, 256), jnp.int32)}

    def fwd(p, x_, m_):
        preds, _ = model(p, x_, mask_inputs=False, task_masks=m_,
                         num_visible=256, deterministic=True,
                         absent_tasks=("slo", "bscanlayermap"))
        return sum(jnp.sum(v.astype(jnp.float32)) for v in preds.values())

    f = flops_of(fwd, params, x, masks)
    lf = block_layer_flops(1024, 16, 257, B, train=False, remat=False)
    return report("infer MIRAGE-Large (wrapper path)", f,
                  (model.depth - 1) * lf, B, 64, dt_ms)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # measured step times (ms) to turn counts into MFU; update from
    # BENCH_TRAIN_r*.json after each bench run
    dts = {k: float(v) for k, v in
           (kv.split("=") for kv in sys.argv[2:] if "=" in kv)}
    if which in ("all", "infer"):
        infer(dts.get("infer"))
    if which in ("all", "pretrain"):
        pretrain(dts.get("pretrain"))
    if which == "pretrain_large":
        pretrain(dts.get("pretrain_large"), size="large", b_real=128)
    if which in ("all", "seg"):
        seg(dts.get("seg"), parity=True)
        seg(dts.get("seg_fast"), parity=False)
    if which in ("all", "cls"):
        cls(dts.get("cls_probe"), dts.get("cls_ft"))
