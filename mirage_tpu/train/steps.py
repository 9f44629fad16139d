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
# no unpatchify / mask-upsample / pixel-stream HBM traffic. Default flipped
# to "token" from the r4 chip A/B: loss-tail micro MSE 28.7 -> 6.0 ms and
# CE 15.5 -> 5.2 ms (scripts/bench_loss_tokens.py); end-to-end pretraining
# 1118.1 -> 1213.8 img/s (+8.6%, the single biggest r4 win). Env override
# (read once at import): MIRAGE_LOSS_SPACE=pixel python ...
from mirage_tpu.utils.envflags import env_choice as _env_choice  # noqa: E402

_LOSS_SPACE = _env_choice("MIRAGE_LOSS_SPACE", "token", ("pixel", "token"))

# FSDP-only meshes (fsdp>1, tensor==1): 'shardmap' runs the ZeRO-style
# shard_map step with the Pallas kernels ENGAGED (_make_fsdp_train_step);
# 'gspmd' keeps the Megatron GSPMD jit, which requires attn_impl='xla'
# (the r4 state of the world — kept as an escape hatch / A-B handle).
_FSDP_STEP = _env_choice("MIRAGE_FSDP_STEP", "shardmap", ("shardmap", "gspmd"))

# Tensor-only meshes (tensor>1, fsdp==1): 'shardmap' runs the Megatron-style
# head/hidden-parallel step with the Pallas kernels ENGAGED
# (_make_tp_train_step — the model must be built with tp=('tensor', t);
# the pretraining CLI does this); 'gspmd' keeps the GSPMD jit with
# attn_impl='xla' (the r4 behavior, kept as escape hatch / A-B handle).
_TP_STEP = _env_choice("MIRAGE_TP_STEP", "shardmap", ("shardmap", "gspmd"))


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
                    mesh=None, donate: bool = True, tp: bool = False,
                    pp: bool = False):
    """Generic fused step: grads -> optimizer update -> metrics.

    state = {'params': ..., 'opt': ..., 'step': int32}
    Returns step_fn(state, batch, rng, lr, wd_scale) -> (state, metrics).

    mesh routing: a data-parallel-only mesh with >1 devices gets the
    shard_map step (params replicated per device, batch sharded, grads
    pmean'd over the batch axes) — REQUIRED for the Pallas kernels to
    engage multi-chip (a pallas_call with GSPMD-sharded operands is a hard
    Mosaic error; see parallel/mesh.dp_shard_map); fsdp-only meshes take
    the ZeRO shard_map step. Tensor-sharded meshes take the Megatron
    shard_map step (and the composed TP x ZeRO step when fsdp > 1 too)
    ONLY when `tp=True` — the caller promises the loss_fn's model was
    built with tp=('tensor', t) (the in-block collectives live in the
    model trace) and the state is placed with shard_state(tp_num_heads=).
    With tp=False, tensor-sharded meshes keep the GSPMD jit — build the
    model with attn_impl='xla' for those. Pipe-sharded meshes take the
    GPipe shard_map step ONLY with `pp=True` — the caller promises the
    loss_fn's model carries pp=('pipe', n_micro) (the pipeline schedule
    lives in the model trace) and the state is placed with shard_state on
    the same mesh; there is no GSPMD fallback for 'pipe' (the axis means
    nothing to sharding specs), so pp=False on such a mesh is an error.
    mesh=None / 1-device meshes use plain jit (identical to before; the
    single-chip bench path is untouched).
    """

    # GSPMD-sharded steps (fsdp/tensor meshes fall through to the plain jit
    # below) must keep the optimizer on pure XLA: a pallas_call (the fused
    # AdamW leaf kernel) with GSPMD-sharded operands is a hard Mosaic error.
    gspmd = mesh is not None and mesh.size > 1

    def step_fn(state, batch, rng, lr, wd_scale):
        def wrapped(params, batch, rng):
            return loss_fn(optimizer.stop_frozen(params), batch, rng)

        (loss, task_losses), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state["params"], batch, rng)
        params, opt_state, gnorm = optimizer.update(
            grads, state["opt"], state["params"], lr, wd_scale,
            allow_kernel=not gspmd)
        new_state = {"params": params, "opt": opt_state, "step": state["step"] + 1}
        metrics = {"loss": loss, "grad_norm": gnorm}
        metrics.update({f"loss_{k}": v for k, v in task_losses.items()})
        return new_state, metrics

    if mesh is not None and mesh.size > 1:
        from mirage_tpu.parallel.mesh import is_dp_only, is_fsdp_only
        from mirage_tpu.parallel.pp import is_pp
        from mirage_tpu.parallel.tp import is_tp_fsdp, is_tp_only

        if is_pp(mesh):
            if not pp:
                raise ValueError(
                    "mesh has a pipe axis > 1 but make_train_step was not "
                    "called with pp=True (and a model carrying "
                    "pp=('pipe', n_micro)) — there is no GSPMD fallback "
                    "for pipeline parallelism")
            return _make_pp_train_step(loss_fn, optimizer, mesh, donate)
        if is_dp_only(mesh):
            return _make_dp_train_step(loss_fn, optimizer, mesh, donate)
        if is_fsdp_only(mesh) and _FSDP_STEP == "shardmap":
            return _make_fsdp_train_step(loss_fn, optimizer, mesh, donate)
        if tp and is_tp_only(mesh) and _TP_STEP == "shardmap":
            return _make_tp_train_step(loss_fn, optimizer, mesh, donate)
        if (tp and is_tp_fsdp(mesh) and _TP_STEP == "shardmap"
                and _FSDP_STEP == "shardmap"):
            return _make_tp_fsdp_train_step(loss_fn, optimizer, mesh, donate)

    # Sharding is data-driven: place `state` with shard_state() and `batch`
    # with shard_batch(); jit infers output shardings via GSPMD propagation.
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _make_dp_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                        mesh, donate: bool):
    """Data-parallel train step via shard_map (kernels-compatible).

    Each device holds the FULL params/opt state (replicated — place the
    state with ``parallel.mesh.replicate``, not shard_state) and computes
    grads on its local batch shard with an rng decorrelated by
    ``fold_in(rng, axis_index)``; grads and losses are pmean'd over the
    batch axes and the optimizer update is computed redundantly per device
    (bitwise-identical everywhere, so the output state stays replicated —
    the standard dp pattern). Semantically equivalent to chunking the batch
    over devices; NOT bitwise-equal to the global-rng GSPMD step because
    mask draws are per-shard (tests/test_kernel_sharding.py pins the exact
    chunked-reference equivalence).
    """
    from jax import shard_map

    axes = ("data", "fsdp")

    def local_step(state, batch, rng, lr, wd_scale):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axes))

        def wrapped(params, batch, rng):
            return loss_fn(optimizer.stop_frozen(params), batch, rng)

        (loss, task_losses), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state["params"], batch, rng)
        loss, task_losses, grads = jax.lax.pmean(
            (loss, task_losses, grads), axes)
        params, opt_state, gnorm = optimizer.update(
            grads, state["opt"], state["params"], lr, wd_scale)
        new_state = {"params": params, "opt": opt_state,
                     "step": state["step"] + 1}
        metrics = {"loss": loss, "grad_norm": gnorm}
        metrics.update({f"loss_{k}": v for k, v in task_losses.items()})
        return new_state, metrics

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axes), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _make_model_sharded_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                             mesh, donate: bool, specs_fn):
    """General model-sharded shard_map train step — Pallas kernels ENGAGED
    (a pallas_call sees only local operands inside shard_map, so the Mosaic
    GSPMD restriction never applies). One builder serves the three sharded
    layouts; the wrappers below only choose ``specs_fn``:

      - ZeRO-FSDP (parallel/mesh.fsdp_param_specs): big leaves sharded over
        'fsdp' on their last axis — pure storage sharding, gathered back
        before compute;
      - Megatron-TP (parallel/tp.tp_param_specs): encoder weight families
        sharded over 'tensor' on their branch axes — COMPUTE sharding; the
        model must be built with tp=('tensor', t) so the blocks run
        head/hidden-parallel with the ident_f/psum_g collectives;
      - composed (parallel/tp.tp_fsdp_specs): both of the above — encoder
        weights sharded over both model axes, fsdp gathered per step.

    Shared mechanics:
      - the batch shards over ('data','fsdp'); the rng folds by that index,
        so all tensor shards of one batch position draw identical masks;
      - every leaf whose spec carries 'fsdp' is all_gather'd per step
        INSIDE the differentiated region (fsdp_gather — the transpose is
        psum_scatter, so those grads arrive reduce-scattered); leaves
        without 'fsdp' pass through untouched;
      - grad reductions follow (spec, tp_grad_kind): 'partial' leaves (the
        in-block LN params under TP — each shard differentiates only its
        own branch) psum over 'tensor' first; fsdp-scattered leaves
        complete the global batch mean with pmean('data')/n_fsdp;
        everything else pmeans over the batch axes. psums over size-1 axes
        are no-ops, which is exactly why one body serves all three layouts
        (verified: each wrapper's equality test pins it against the dp
        step — tests/test_fsdp_step.py, tests/test_tp_step.py);
      - the global clip/skip norm psums each leaf's squared sum over
        whichever axes its gradient is split across ('tensor' for
        tp-'local' leaves, 'fsdp' for scattered ones), bucketed so each
        axis combination psums once;
      - the optimizer updates local shards — ZeRO optimizer-state sharding
        over every sharded axis for free, clip/skip driven by the true
        global norm.

    Memory per device: weights+moments 1/(shards)'d at rest; fsdp-gathered
    full (or tensor-local) weights are live during the step (ViT-L:
    ~1.3 GB f32 fully gathered — the activation savings of remat dominate).
    """
    from jax import shard_map
    from mirage_tpu.parallel.mesh import fsdp_gather
    from mirage_tpu.parallel.tp import tp_grad_kind

    batch_axes = ("data", "fsdp")
    n_fsdp = mesh.shape["fsdp"]
    cache = {}

    def build(state, batch):
        pspecs = specs_fn(state["params"], mesh)
        kinds = tp_grad_kind(state["params"])

        def local_step(state, batch, rng, lr, wd_scale):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(batch_axes))

            def wrapped(local_params, batch, rng):
                full = fsdp_gather(local_params, pspecs)
                return loss_fn(optimizer.stop_frozen(full), batch, rng)

            (loss, task_losses), grads = jax.value_and_grad(
                wrapped, has_aux=True)(state["params"], batch, rng)

            def reduce_g(g, sp, kind):
                if kind == "partial":
                    g = jax.lax.psum(g, "tensor")
                if sp and "fsdp" in sp:
                    return jax.lax.pmean(g, "data") / n_fsdp
                return jax.lax.pmean(g, batch_axes)

            grads = jax.tree_util.tree_map(reduce_g, grads, pspecs, kinds)
            loss, task_losses = jax.lax.pmean((loss, task_losses), batch_axes)

            f32sq = lambda x: jnp.sum(jnp.square(x.astype(jnp.float32)))
            buckets = {(): jnp.float32(0), ("tensor",): jnp.float32(0),
                       ("fsdp",): jnp.float32(0),
                       ("fsdp", "tensor"): jnp.float32(0)}
            for g, sp, kind in zip(jax.tree_util.tree_leaves(grads),
                                   jax.tree_util.tree_leaves(pspecs),
                                   jax.tree_util.tree_leaves(kinds)):
                axes = ()
                if sp and "fsdp" in sp:
                    axes += ("fsdp",)
                if kind == "local":
                    axes += ("tensor",)
                axes = tuple(sorted(axes))
                buckets[axes] = buckets[axes] + f32sq(g)
            sq = buckets[()]
            for axes, v in buckets.items():
                if axes:
                    sq = sq + jax.lax.psum(v, axes)
            gnorm = jnp.sqrt(sq)

            params, opt_state, _ = optimizer.update(
                grads, state["opt"], state["params"], lr, wd_scale,
                gnorm=gnorm)
            new_state = {"params": params, "opt": opt_state,
                         "step": state["step"] + 1}
            metrics = {"loss": loss, "grad_norm": gnorm}
            metrics.update({f"loss_{k}": v for k, v in task_losses.items()})
            return new_state, metrics

        mspecs = jax.tree_util.tree_map(
            lambda m, sp: sp if m.ndim else P(), state["opt"]["mu"], pspecs)
        state_specs = {
            "params": pspecs,
            "opt": {k: (mspecs if k in ("mu", "nu") else P())
                    for k in state["opt"]},
            "step": P(),
        }
        batch_specs = jax.tree_util.tree_map(lambda _: P(batch_axes), batch)
        step = shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, batch_specs, P(), P(), P()),
            out_specs=(state_specs, P()),
            check_vma=False)
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def stepper(state, batch, rng, lr, wd_scale):
        # Specs depend on leaf shapes, so the shard_map is built lazily from
        # the first (state, batch) and cached (one structure per stepper).
        if "fn" not in cache:
            cache["fn"] = build(state, batch)
        return cache["fn"](state, batch, rng, lr, wd_scale)

    # exposed for AOT export checks: build(abstract_state, abstract_batch)
    # accepts ShapeDtypeStruct pytrees (specs only need shapes/dtypes)
    stepper.build = build
    return stepper


def _make_fsdp_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                          mesh, donate: bool):
    """ZeRO-style FSDP train step (fsdp-only meshes): storage-sharded big
    leaves, per-step gather, same single-device trace as the dp step —
    semantics per _make_model_sharded_step; NOT bitwise the single-device
    global-rng step (masks are per-shard draws, like the dp step)."""
    from mirage_tpu.parallel.mesh import fsdp_param_specs

    return _make_model_sharded_step(loss_fn, optimizer, mesh, donate,
                                    fsdp_param_specs)


def _make_tp_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                        mesh, donate: bool):
    """Megatron tensor-parallel train step (tensor-only meshes). Contract:
    ``loss_fn`` closes over a model built with tp=('tensor', t)
    (nn/block._tp_block_apply provides the in-block collectives) and the
    state is placed with shard_state(tp_num_heads=) so the fused-qkv
    leaves are head-group-major (parallel/tp.tp_relayout). Semantics per
    _make_model_sharded_step."""
    from mirage_tpu.parallel.tp import tp_param_specs

    return _make_model_sharded_step(loss_fn, optimizer, mesh, donate,
                                    tp_param_specs)


def _make_tp_fsdp_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                             mesh, donate: bool):
    """Composed Megatron-TP x ZeRO-FSDP step (tensor>1 AND fsdp>1):
    encoder weights sharded over BOTH model axes (parallel/tp.tp_fsdp_specs),
    the 'fsdp' axis gathered per step. Same model/placement contract as
    _make_tp_train_step; semantics per _make_model_sharded_step."""
    from mirage_tpu.parallel.tp import tp_fsdp_specs

    return _make_model_sharded_step(loss_fn, optimizer, mesh, donate,
                                    tp_fsdp_specs)


def _make_pp_train_step(loss_fn: Callable, optimizer: GroupedOptimizer,
                        mesh, donate: bool):
    """GPipe pipeline-parallel train step (pipe>1 meshes, data any) — Pallas
    kernels ENGAGED (inside shard_map every pallas_call sees local operands).

    Contract: ``loss_fn`` closes over a model built with
    pp=('pipe', n_micro) — the pipeline schedule (parallel/pp.pp_encoder_apply:
    per-stage local layer stacks, one ppermute rotation per tick, masked-psum
    output broadcast) lives in the model trace; this builder supplies the
    sharding, the loss scaling and the gradient bookkeeping derived in
    parallel/pp.py's module docstring:

      - stacked encoder leaves (and their Adam moments) shard over 'pipe' on
        the leading layer axis (pp_param_specs) — stage-local storage AND
        compute; everything else (adapters/decoders, tiny next to the
        encoder) is replicated over 'pipe' and the rng folds only by the
        batch index, so the pre/post-encoder compute is identical on every
        stage of one batch shard (the Dirichlet mask draws MUST agree across
        stages: stage 0 feeds the tokens all stages' decoders assume);
      - the per-device loss is scaled by 1/n_stages before autodiff: the
        masked-psum broadcast transposes to a psum of the S replicated
        cotangents (full dL/dout into the last stage's buffer — pipe-LOCAL
        encoder grads arrive complete), while replicated leaves' grads
        arrive as one S-th per stage (decoder-side) or stage-0-only
        (input-side), both completed by a single psum('pipe');
      - backward is pure autodiff through the tick scan (ppermute transposes
        to the inverse rotation; bubble chains get zero cotangents);
      - the clip/skip norm psums the stage-sharded encoder leaves' squared
        sums over 'pipe'; replicated leaves count once.

    Scope (asserted): no fsdp/tensor sharding composed in, and the optimizer
    must not use layer_decay (its lr-scale vectors span the FULL depth; the
    reference pretraining optimizer doesn't — run_pretraining.py:504).
    """
    from jax import shard_map
    from mirage_tpu.parallel.pp import pp_grad_kind, pp_param_specs

    assert mesh.shape.get("fsdp", 1) == 1 and mesh.shape.get("tensor", 1) == 1, (
        "pipeline parallelism composes only with data parallelism "
        f"(mesh {dict(mesh.shape)}); fsdp/tensor x pipe is not implemented")
    assert getattr(optimizer, "cfg", None) is None \
        or optimizer.cfg.layer_decay is None, (
            "pipeline parallelism requires layer_decay=None: the layer-decay "
            "lr scales are full-depth vectors the stage-local encoder shards "
            "can't index (parallel/pp.py scope note)")

    batch_axes = ("data", "fsdp")
    n_stages = mesh.shape["pipe"]
    cache = {}

    def build(state, batch):
        pspecs = pp_param_specs(state["params"], mesh)
        kinds = pp_grad_kind(state["params"])

        def local_step(state, batch, rng, lr, wd_scale):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(batch_axes))

            def wrapped(local_params, batch, rng):
                loss, aux = loss_fn(optimizer.stop_frozen(local_params),
                                    batch, rng)
                return loss / n_stages, (loss, aux)

            (_, (loss, task_losses)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(state["params"], batch, rng)

            def reduce_g(g, kind):
                if kind == "sum":
                    g = jax.lax.psum(g, "pipe")
                return jax.lax.pmean(g, batch_axes)

            grads = jax.tree_util.tree_map(reduce_g, grads, kinds)
            loss, task_losses = jax.lax.pmean((loss, task_losses), batch_axes)

            f32sq = lambda x: jnp.sum(jnp.square(x.astype(jnp.float32)))
            local_sq = jnp.float32(0)
            repl_sq = jnp.float32(0)
            for g, kind in zip(jax.tree_util.tree_leaves(grads),
                               jax.tree_util.tree_leaves(kinds)):
                if kind == "local":
                    local_sq = local_sq + f32sq(g)
                else:
                    repl_sq = repl_sq + f32sq(g)
            gnorm = jnp.sqrt(repl_sq + jax.lax.psum(local_sq, "pipe"))

            params, opt_state, _ = optimizer.update(
                grads, state["opt"], state["params"], lr, wd_scale,
                gnorm=gnorm)
            new_state = {"params": params, "opt": opt_state,
                         "step": state["step"] + 1}
            metrics = {"loss": loss, "grad_norm": gnorm}
            metrics.update({f"loss_{k}": v for k, v in task_losses.items()})
            return new_state, metrics

        mspecs = jax.tree_util.tree_map(
            lambda m, sp: sp if m.ndim else P(), state["opt"]["mu"], pspecs)
        state_specs = {
            "params": pspecs,
            "opt": {k: (mspecs if k in ("mu", "nu") else P())
                    for k in state["opt"]},
            "step": P(),
        }
        batch_specs = jax.tree_util.tree_map(
            lambda _: P(batch_axes), batch)
        step = shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, batch_specs, P(), P(), P()),
            out_specs=(state_specs, P()),
            check_vma=False)
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def stepper(state, batch, rng, lr, wd_scale):
        if "fn" not in cache:
            cache["fn"] = build(state, batch)
        return cache["fn"](state, batch, rng, lr, wd_scale)

    stepper.build = build
    return stepper


def init_train_state(params, optimizer: GroupedOptimizer):
    return {"params": params, "opt": optimizer.init(params),
            "step": jnp.zeros((), jnp.int32)}


def shard_state(state, mesh, tp_num_heads=None):
    """Place the train state on the mesh: params (and adam moments) per
    param_specs, scalars replicated. Data-parallel-only meshes replicate
    everything (the shard_map dp step needs whole-param programs per
    device; param_specs' size-1 fsdp/tensor axes would be equivalent, but
    explicit replication keeps the placement obvious).

    tp_num_heads: required on tensor-only meshes taking the shard_map TP
    step — the encoder's num_heads, needed to permute the fused-qkv leaves
    head-group-major before sharding (parallel/tp.tp_relayout)."""
    from mirage_tpu.parallel.mesh import (fsdp_param_specs, is_dp_only,
                                          is_fsdp_only, replicate)
    from mirage_tpu.parallel.tp import (is_tp_fsdp, is_tp_only,
                                        tp_fsdp_specs, tp_param_specs,
                                        tp_relayout_state)

    # TP placement is opt-in via tp_num_heads (mirrors make_train_step's
    # tp flag): tensor-sharded meshes WITHOUT it keep the GSPMD
    # param_specs placement (attn_impl='xla' models).
    tp_shardmap = (tp_num_heads is not None and mesh.size > 1
                   and _TP_STEP == "shardmap"
                   and (is_tp_only(mesh)
                        or (is_tp_fsdp(mesh) and _FSDP_STEP == "shardmap")))
    if mesh.size > 1 and is_dp_only(mesh):
        return replicate(state, mesh)
    if mesh.size > 1 and mesh.shape.get("pipe", 1) > 1:
        # pipeline placement (no GSPMD fallback exists for 'pipe'): stacked
        # encoder leaves + moments sharded over 'pipe' on the layer axis,
        # everything else replicated (parallel/pp.pp_param_specs).
        from mirage_tpu.parallel.pp import pp_param_specs

        pspecs = pp_param_specs(state["params"], mesh)
    elif tp_shardmap:
        state = tp_relayout_state(state, tp_num_heads, mesh.shape["tensor"])
        specs_fn = tp_param_specs if is_tp_only(mesh) else tp_fsdp_specs
        pspecs = specs_fn(state["params"], mesh)
    elif mesh.size > 1 and is_fsdp_only(mesh) and _FSDP_STEP == "shardmap":
        # ZeRO layout for the shard_map FSDP step: params/moments sharded
        # over 'fsdp' on their last axis, everything else replicated.
        pspecs = fsdp_param_specs(state["params"], mesh)
    else:
        if mesh.size > 1:
            from mirage_tpu.ops import runtime

            if runtime.kernels_enabled():
                # GSPMD param sharding + fused kernels = hard Mosaic error at
                # compile; the model must be built with attn_impl='xla' (the
                # pretraining CLI does this automatically)
                print("shard_state: tensor/GSPMD-sharded mesh with kernels "
                      "enabled — ensure the model uses attn_impl='xla' "
                      "(parallel/mesh.py docstring)", flush=True)
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
