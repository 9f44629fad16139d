"""Jitted train/eval step builders.

Parity targets: run_pretraining.py train_one_epoch (:648-767) — Dirichlet
masked forward, per-task masked losses summed, AdamW with per-step cosine
LR/WD, grad clip/skip; and the seg/cls step shapes.

TPU-native: one fused jit per step; batch sharded over ('data','fsdp'),
params sharded per parallel/mesh.py; LR/WD arrive as traced scalars from
host-side schedule arrays (no recompiles); loss in f32; model compute dtype
is configurable (bf16 on TPU).
"""

import os
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mirage_tpu.losses.masked import (masked_ce_loss, masked_ce_loss_tokens,
                                      masked_mse_loss, masked_mse_loss_tokens)
from mirage_tpu.parallel.mesh import batch_spec, param_specs
from mirage_tpu.train.optim import GroupedOptimizer


# Loss computation space for the pretraining step. "token" computes the
# masked losses on the decoders' pre-unpatchify patch tokens — algebraically
# identical to the pixel path (losses/masked.py equivalence notes) but with
# no unpatchify / mask-upsample / pixel-stream HBM traffic. Chip A/B:
# MIRAGE_LOSS_SPACE=token python scripts/bench_loss_tokens.py (and
# scripts/bench_train.py pretrain). Default stays "pixel" until measured.
from mirage_tpu.utils.envflags import env_choice as _env_choice  # noqa: E402

_LOSS_SPACE = _env_choice("MIRAGE_LOSS_SPACE", "pixel", ("pixel", "token"))


def make_pretrain_loss(model, domain_conf: Mapping[str, Mapping[str, Any]],
                       num_encoded_tokens: int, alphas=1.0,
                       sample_tasks_uniformly: bool = False,
                       loss_on_unmasked: bool = False):
    """domain_conf: task -> {'loss': 'mse'|'ce', 'patch_size': int,
    'norm_pix': bool}. Returns loss_fn(params, batch, rng) -> (loss, aux)."""
    token_space = _LOSS_SPACE == "token"

    def loss_fn(params, batch, rng):
        preds, masks = model(
            params, batch, mask_inputs=True,
            num_encoded_tokens=num_encoded_tokens, alphas=alphas,
            sample_tasks_uniformly=sample_tasks_uniformly,
            rng=rng, deterministic=False, pixel_outputs=not token_space)
        task_losses = {}
        for task, pred in preds.items():
            conf = domain_conf[task]
            mask = None if loss_on_unmasked else masks[task]
            target = batch[task]
            if conf["loss"] == "ce":
                ce = masked_ce_loss_tokens if token_space else masked_ce_loss
                task_losses[task] = ce(
                    pred, target, mask, patch_size=conf["patch_size"])
            else:
                mse = masked_mse_loss_tokens if token_space else masked_mse_loss
                task_losses[task] = mse(
                    pred.astype(jnp.float32), target.astype(jnp.float32), mask,
                    patch_size=conf["patch_size"],
                    norm_pix=conf.get("norm_pix", False))
        total = sum(task_losses.values())
        return total, task_losses

    return loss_fn


def make_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                    mesh=None, donate: bool = True):
    """Generic fused step: grads -> optimizer update -> metrics.

    state = {'params': ..., 'opt': ..., 'step': int32}
    Returns step_fn(state, batch, rng, lr, wd_scale) -> (state, metrics).
    """

    def step_fn(state, batch, rng, lr, wd_scale):
        def wrapped(params, batch, rng):
            return loss_fn(optimizer.stop_frozen(params), batch, rng)

        (loss, task_losses), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state["params"], batch, rng)
        params, opt_state, gnorm = optimizer.update(
            grads, state["opt"], state["params"], lr, wd_scale)
        new_state = {"params": params, "opt": opt_state, "step": state["step"] + 1}
        metrics = {"loss": loss, "grad_norm": gnorm}
        metrics.update({f"loss_{k}": v for k, v in task_losses.items()})
        return new_state, metrics

    # Sharding is data-driven: place `state` with shard_state() and `batch`
    # with shard_batch(); jit infers output shardings via GSPMD propagation.
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def init_train_state(params, optimizer: GroupedOptimizer):
    return {"params": params, "opt": optimizer.init(params),
            "step": jnp.zeros((), jnp.int32)}


def shard_state(state, mesh):
    """Place the train state on the mesh: params (and adam moments) per
    param_specs, scalars replicated."""
    pspecs = param_specs(state["params"])

    def place(tree, specs):
        # frozen-param moments are scalar placeholders (optim.py init):
        # replicate anything whose rank is below its param spec
        return jax.tree_util.tree_map(
            lambda x, sp: jax.device_put(
                x, NamedSharding(mesh, sp if x.ndim >= len(sp) else P())),
            tree, specs)

    out = {"params": place(state["params"], pspecs), "opt": {}, "step":
           jax.device_put(state["step"], NamedSharding(mesh, P()))}
    for k, v in state["opt"].items():
        if k in ("mu", "nu"):
            out["opt"][k] = place(v, pspecs)
        else:
            out["opt"][k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def shard_batch(batch, mesh):
    """Place a batch on the mesh. Single-process: device_put with the batch
    sharding. Multi-host: each process holds only its local stripe (the
    DataLoader shards by process), so the global array is assembled from
    process-local data."""
    if jax.process_count() > 1:
        from mirage_tpu.parallel.mesh import global_batch_from_local

        return global_batch_from_local(mesh, batch)

    def place(x):
        spec = P(batch_spec()[0], *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)
