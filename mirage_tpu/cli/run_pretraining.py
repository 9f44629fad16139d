"""MIRAGE multimodal masked pretraining workload.

Parity: run_pretraining.py — 3 domains in/out, MaskedMSE (bscan/slo) +
MaskedCE (bscanlayermap), Dirichlet masking with num_encoded_tokens of the
full token budget, summed task losses, per-step cosine LR/WD, grad
clip/skip, checkpoint every N epochs + auto-resume, debug recon dumps at
epoch starts, NaN hard exit, warm starts from MultiMAE-B/MAE-L weights.

TPU-native: one fused jitted train step (forward+losses+grads+AdamW update)
with the batch sharded over a ('data','fsdp','tensor') mesh; bf16 compute
by default (no AMP GradScaler — grad-norm clip/skip survives in the
optimizer); host-side schedule arrays feed traced lr/wd scalars (zero
recompiles); orbax checkpoints.

Usage:
  python -m mirage_tpu.cli.run_pretraining -c configs/pretrain_mirage.yaml \
      --data_path /data/pretrain --output_dir ./out
"""

import argparse
import os
import sys
import time

import numpy as np

from mirage_tpu.cli.config import (apply_platform_env, normalize_domain_sizes,
                                   parse_with_yaml, save_args, str2bool)

apply_platform_env()


def get_parser():
    p = argparse.ArgumentParser("MIRAGE pretraining (TPU)", add_help=True)
    # schedule / batch
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--epochs", default=1600, type=int)
    p.add_argument("--save_ckpt_freq", default=20, type=int)
    # tasks
    p.add_argument("--in_domains", default="bscan-slo-bscanlayermap", type=str)
    p.add_argument("--out_domains", default="bscan-slo-bscanlayermap", type=str)
    # model
    p.add_argument("--model", default="miragepre_base", type=str)
    p.add_argument("--num_encoded_tokens", default=98, type=int)
    p.add_argument("--perc_encoded_tokens", default=None, type=float)
    p.add_argument("--num_global_tokens", default=1, type=int)
    p.add_argument("--patch_size", default=32, type=int)
    p.add_argument("--input_size", default=512, type=int)
    p.add_argument("--alphas", default=1.0, type=float)
    p.add_argument("--sample_tasks_uniformly", default=False, action="store_true")
    p.add_argument("--decoder_use_task_queries", default=True, type=str2bool)
    p.add_argument("--decoder_use_xattn", default=True, type=str2bool)
    p.add_argument("--decoder_dim", default=256, type=int)
    p.add_argument("--decoder_depth", default=2, type=int)
    p.add_argument("--decoder_num_heads", default=8, type=int)
    p.add_argument("--drop_path", default=0.0, type=float)
    p.add_argument("--loss_on_unmasked", default=False, action="store_true")
    p.add_argument("--norm_pix_loss", default=False, action="store_true")
    # optimizer
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=[0.9, 0.95], type=float, nargs="+")
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--skip_grad", default=None, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--weight_decay_end", default=None, type=float)
    p.add_argument("--decoder_decay", default=None, type=float)
    p.add_argument("--blr", default=1e-4, type=float,
                   help="base lr; lr = blr * batch_size / 256")
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--warmup_lr", default=1e-6, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--warmup_epochs", default=40, type=int)
    p.add_argument("--warmup_steps", default=-1, type=int)
    # augmentation
    p.add_argument("--hflip", default=0.5, type=float)
    p.add_argument("--intensity_shift", default=0.1, type=float)
    p.add_argument("--affine", default=True, type=str2bool)
    # data / io
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--output_dir", default="./output/pretrain", type=str)
    p.add_argument("--num_workers", default=10, type=int)
    p.add_argument("--use_cache", default=False, action="store_true")
    p.add_argument("--weights", default="", type=str,
                   help="warm-start checkpoint (.pth/.safetensors)")
    p.add_argument("--auto_resume", default=True, type=str2bool)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--remat", default=True, type=str2bool,
                   help="per-layer rematerialization (activation checkpointing)")
    p.add_argument("--mesh_fsdp", default=1, type=int)
    p.add_argument("--mesh_tensor", default=1, type=int)
    p.add_argument("--mesh_pipe", default=1, type=int,
                   help="GPipe pipeline stages over the encoder depth "
                        "(parallel/pp.py; kernels engaged; composes with "
                        "data parallelism only; requires --drop_path 0)")
    p.add_argument("--pp_microbatches", default=0, type=int,
                   help="microbatches per local batch for --mesh_pipe > 1 "
                        "(0 = auto: 2x stages, shrunk to divide the local "
                        "batch; bubble fraction is (S-1)/(M+S-1))")
    p.add_argument("--distributed", default=False, action="store_true",
                   help="multi-host: call jax.distributed.initialize before "
                        "touching the backend (coordinator/process info from "
                        "the flags below or cluster auto-detection)")
    p.add_argument("--coordinator_address", default=None, type=str)
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    p.add_argument("--log_freq", default=20, type=int)
    p.add_argument("--debug_images", default=True, type=str2bool)
    p.add_argument("--max_steps_per_epoch", default=None, type=int,
                   help="debug/smoke-run cap")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler trace of epoch 0 into this dir")
    return p


DOMAIN_DEFAULTS = {
    "bscan": {"channels": 1, "stride_level": 1, "loss": "mse", "semseg": False},
    "slo": {"channels": 1, "stride_level": 1, "loss": "mse", "semseg": False},
    "bscanlayermap": {"num_classes": 13, "channels": 13, "stride_level": 1,
                      "loss": "ce", "semseg": True, "dim_class_emb": 64},
}


def build_model(args):
    from mirage_tpu.adapters import (PatchedInputAdapter, SemSegInputAdapter,
                                     SpatialOutputAdapter)
    from mirage_tpu.models.mirage import model_factory
    import jax.numpy as jnp

    input_adapters = {}
    for d in args.in_domains:
        conf = DOMAIN_DEFAULTS[d]
        if conf["semseg"]:
            input_adapters[d] = SemSegInputAdapter(
                num_classes=conf["num_classes"], stride_level=conf["stride_level"],
                patch_size_full=args.patch_size[d], dim_class_emb=conf["dim_class_emb"],
                image_size=args.input_size[d])
        else:
            input_adapters[d] = PatchedInputAdapter(
                num_channels=conf["channels"], stride_level=conf["stride_level"],
                patch_size_full=args.patch_size[d], image_size=args.input_size[d])
    output_adapters = {
        d: SpatialOutputAdapter(
            num_channels=DOMAIN_DEFAULTS[d]["channels"],
            stride_level=DOMAIN_DEFAULTS[d]["stride_level"],
            patch_size_full=args.patch_size[d], dim_tokens=args.decoder_dim,
            depth=args.decoder_depth, num_heads=args.decoder_num_heads,
            use_task_queries=args.decoder_use_task_queries, task=d,
            context_tasks=tuple(args.in_domains), use_xattn=args.decoder_use_xattn,
            image_size=args.input_size[d])
        for d in args.out_domains
    }
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    return model_factory[args.model](
        input_adapters, output_adapters, num_global_tokens=args.num_global_tokens,
        drop_path_rate=args.drop_path, compute_dtype=dtype,
        remat=getattr(args, "remat", False))


# Weight-filename substring -> model config (run_pretraining.py:353-368 +
# docs/pretraining.md: 'multimae-b' warm-starts MIRAGE-Base, 'mae_pretrain'
# warm-starts MIRAGE-Large)
WARMSTART_MODEL_KEYS = {"multimae-b": "miragepre_base",
                        "mae_pretrain": "miragepre_large"}


def pick_model_from_weights(args, default: str = "miragepre_base"):
    if args.model != default or not args.weights:
        return args.model
    for kw, name in WARMSTART_MODEL_KEYS.items():
        if kw in os.path.basename(args.weights).lower():
            print(f">> Model {name} selected by weights filename ('{kw}')")
            return name
    return args.model


def warm_start(params, model, weights_path: str):
    from mirage_tpu.api import convert

    if weights_path.endswith(".pth"):
        sd = convert.load_torch_checkpoint(weights_path)["model"]
    else:
        sd = convert.load_safetensors(weights_path)
    if "_vit_large" in weights_path or any(k.startswith("blocks.") for k in sd):
        sd = convert.rename_keys(sd, {r"^blocks\.": "encoder."})
    print(f">> Warm start from {weights_path} ({len(sd)} tensors)")
    return convert.overlay_torch_params(params, sd, model)


def save_debug_images(output_dir, epoch, batch, preds, masks, args):
    """Reconstruction panels at epoch start (run_pretraining.py:569-645):
    input | masked-input | prediction per domain, first 4 samples."""
    from PIL import Image

    def to_u8(x):
        x = np.asarray(x, np.float32)
        lo, hi = x.min(), x.max()
        return ((x - lo) / max(hi - lo, 1e-12) * 255).astype(np.uint8)

    os.makedirs(os.path.join(output_dir, "debug"), exist_ok=True)
    n = min(4, next(iter(batch.values())).shape[0])
    for task, pred in preds.items():
        rows = []
        gh, gw = args.grid_size[task]
        ph = args.input_size[task][0] // gh
        pw = args.input_size[task][1] // gw
        for i in range(n):
            tgt = np.asarray(batch[task][i])
            if tgt.ndim == 3:
                tgt = tgt[0]
            pr = np.asarray(pred[i])
            pr = pr.argmax(0) if pr.shape[0] > 1 else pr[0]
            m = np.asarray(masks[task][i]).reshape(gh, gw)
            m_img = np.kron(m, np.ones((ph, pw)))
            masked = np.where(m_img > 0, 0, tgt)
            rows.append(np.concatenate([to_u8(tgt), to_u8(masked), to_u8(pr)], axis=1))
        panel = np.concatenate(rows, axis=0)
        Image.fromarray(panel).save(
            os.path.join(output_dir, "debug", f"e{epoch:05d}_{task}.png"))


def main(argv=None):
    args = parse_with_yaml(get_parser(), argv)
    args.in_domains = args.in_domains.split("-")
    args.out_domains = args.out_domains.split("-")
    args.all_domains = sorted(set(args.in_domains) | set(args.out_domains))
    normalize_domain_sizes(args, args.all_domains)

    import jax
    import jax.numpy as jnp

    from mirage_tpu.data import DataLoader, MultiTaskPretDatasetFolder, PretrainAugment
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train import checkpoint as ckpt
    from mirage_tpu.train.logger import MetricLogger, append_log
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.schedules import cosine_scheduler
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch, shard_state)

    if args.distributed:
        # multi-host DCN: per-host DataLoader stripes are assembled into
        # logically-global arrays by shard_batch's process_count()>1 branch
        # (tests/test_multihost.py runs this two-process on the real model)
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)
        print(f"process {jax.process_index()}/{jax.process_count()}")

    print(f"Devices: {jax.device_count()} ({jax.default_backend()})")
    ndev = jax.device_count()
    axes = {"data": ndev // (args.mesh_fsdp * args.mesh_tensor
                             * args.mesh_pipe),
            "fsdp": args.mesh_fsdp, "tensor": args.mesh_tensor}
    if args.mesh_pipe > 1:  # 4th axis only when requested (mesh.py note)
        axes["pipe"] = args.mesh_pipe
    mesh = make_mesh(axes)
    n_batch_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    if args.batch_size % n_batch_shards:
        sys.exit(f"--batch_size {args.batch_size} must be divisible by the "
                 f"{n_batch_shards} batch-sharding devices (data x fsdp) — "
                 f"both the shard_map dp step and NamedSharding placement "
                 f"need even shards")

    args.model = pick_model_from_weights(args)
    model = build_model(args)
    import dataclasses

    from mirage_tpu.train.steps import _FSDP_STEP, _TP_STEP
    tp_shardmap = (mesh.size > 1 and args.mesh_tensor > 1
                   and _TP_STEP == "shardmap"
                   and (args.mesh_fsdp == 1 or _FSDP_STEP == "shardmap"))
    if tp_shardmap:
        # Megatron shard_map TP step (train/steps._make_tp_train_step, or
        # the composed TP x ZeRO step when fsdp > 1 too): encoder weights
        # shard over 'tensor' (and 'fsdp'), Pallas kernels ENGAGED on
        # shard-local operands (parallel/tp.py). The GSPMD alternative
        # below costs a measured 25-33%/chip (BASELINE.md round 5).
        t = args.mesh_tensor
        hidden = int(model.dim_tokens * model.mlp_ratio)
        if model.num_heads % t or hidden % t:
            sys.exit(f"--mesh_tensor {t} must divide num_heads "
                     f"({model.num_heads}) and the MLP hidden dim ({hidden})")
        kind = ("Megatron+ZeRO shard_map step"
                if args.mesh_fsdp > 1 else "Megatron shard_map step")
        print(f">> tensor mesh: {kind}, {t}-way head/hidden-parallel "
              f"encoder (kernels engaged)")
        model = dataclasses.replace(model, tp=("tensor", t))
    pp_shardmap = args.mesh_pipe > 1
    if pp_shardmap:
        # GPipe shard_map step (train/steps._make_pp_train_step): stacked
        # encoder leaves sharded over 'pipe' on the layer axis, stage-local
        # Pallas kernels, one ppermute rotation per tick (parallel/pp.py).
        s = args.mesh_pipe
        if args.mesh_fsdp > 1 or args.mesh_tensor > 1:
            sys.exit("--mesh_pipe composes only with data parallelism "
                     "(pipe x fsdp/tensor is not implemented)")
        if model.depth % s:
            sys.exit(f"--mesh_pipe {s} must divide the encoder depth "
                     f"({model.depth})")
        if args.drop_path != 0.0:
            sys.exit("--mesh_pipe requires --drop_path 0 (per-layer rates "
                     "span the full depth — parallel/pp.py scope note; every "
                     "reference pretraining config uses 0.0)")
        local_b = args.batch_size // n_batch_shards
        if args.pp_microbatches:
            n_micro = args.pp_microbatches
            if n_micro < 1 or local_b % n_micro:
                sys.exit(f"--pp_microbatches {n_micro} must be a positive "
                         f"divisor of the local batch ({local_b} = "
                         f"batch_size / (data x fsdp))")
        else:  # auto: 2x stages, shrunk to the nearest divisor
            n_micro = min(local_b, 2 * s)
            while local_b % n_micro:
                n_micro -= 1
        print(f">> pipe mesh: GPipe shard_map step, {s} stages x {n_micro} "
              f"microbatches (bubble {(s - 1) / (n_micro + s - 1):.0%}, "
              f"kernels engaged)")
        model = dataclasses.replace(model, pp=("pipe", n_micro))
    gspmd_shards = (args.mesh_tensor > 1 and not tp_shardmap) or (
        args.mesh_fsdp > 1 and args.mesh_tensor == 1
        and _FSDP_STEP == "gspmd")
    if mesh.size > 1 and gspmd_shards:
        # GSPMD-sharded params: the fused kernels cannot engage (a
        # pallas_call with sharded operands is a hard Mosaic error, and
        # in-kernel LN/matmuls can't span a sharded D) — force the XLA
        # compute path up front instead of failing at compile. fsdp-only,
        # tensor-only and combined meshes do NOT hit this: they take the
        # shard_map ZeRO / Megatron / composed steps (train/steps.py),
        # kernels engaged; only the env escape hatches remain GSPMD.
        if model.attn_impl != "xla":
            print(">> GSPMD-sharded mesh: forcing attn_impl='xla' "
                  "(fused kernels require shard_map — parallel/mesh.py)")
            model = dataclasses.replace(model, attn_impl="xla")
    params = model.init_params(jax.random.PRNGKey(args.seed))

    total_tokens = sum(
        args.grid_size[d][0] * args.grid_size[d][1] for d in args.in_domains)
    if args.perc_encoded_tokens is not None:
        args.num_encoded_tokens = int(total_tokens * args.perc_encoded_tokens)
    print(f"Tokens: {args.num_encoded_tokens} encoded of {total_tokens}")

    if args.weights:
        params = warm_start(params, model, args.weights)

    # data
    aug = PretrainAugment(
        {d: args.input_size[d] for d in args.in_domains}, hflip=args.hflip,
        intensity_shift=args.intensity_shift, affine=args.affine)
    dataset = MultiTaskPretDatasetFolder(
        args.data_path, args.in_domains, transform=aug, use_cache=args.use_cache)
    n_hosts = jax.process_count()
    loader = DataLoader(dataset, args.batch_size, shuffle=True, drop_last=True,
                        num_workers=args.num_workers, seed=args.seed,
                        shard_index=jax.process_index(), num_shards=n_hosts)
    steps_per_epoch = len(loader)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    if steps_per_epoch == 0:
        raise RuntimeError("Dataset smaller than one batch")

    # optimizer + schedules
    if args.lr is None:
        args.lr = args.blr * args.batch_size * n_hosts / 256.0
    opt = create_optimizer(OptimizerConfig(
        opt=args.opt, betas=tuple(args.opt_betas), eps=args.opt_eps,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        skip_grad=args.skip_grad, decoder_decay=args.decoder_decay))
    lr_sched = cosine_scheduler(args.lr, args.min_lr, args.epochs, steps_per_epoch,
                                warmup_epochs=args.warmup_epochs,
                                start_warmup_value=args.warmup_lr,
                                warmup_steps=args.warmup_steps)
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_sched = cosine_scheduler(1.0, wd_end / max(args.weight_decay, 1e-12),
                                args.epochs, steps_per_epoch)

    domain_conf = {
        d: {"loss": DOMAIN_DEFAULTS[d]["loss"],
            "patch_size": args.patch_size[d][0],
            "norm_pix": args.norm_pix_loss}
        for d in args.out_domains
    }
    loss_fn = make_pretrain_loss(model, domain_conf, args.num_encoded_tokens,
                                 alphas=args.alphas,
                                 sample_tasks_uniformly=args.sample_tasks_uniformly,
                                 loss_on_unmasked=args.loss_on_unmasked)
    # mesh routing: dp-only, fsdp-only and tensor-only meshes all take
    # shard_map steps with the Pallas kernels engaged (dp / ZeRO-FSDP /
    # Megatron-TP, train/steps.py); combined fsdp x tensor meshes keep
    # GSPMD with attn_impl='xla'
    step_fn = make_train_step(loss_fn, opt, mesh=mesh, tp=tp_shardmap,
                              pp=pp_shardmap)

    state = init_train_state(params, opt)
    del params
    start_epoch = 0
    if args.auto_resume:
        state, start_epoch = ckpt.auto_load_checkpoint(args.output_dir, state)
        if start_epoch:
            print(f">> Resumed from epoch {start_epoch}")
    # tensor-only shardmap meshes: shard_state tp_relayout's the qkv leaves
    # (head-group-major) before sharding — checkpoints stay in the standard
    # layout (the save below inverts it)
    state = shard_state(
        state, mesh,
        tp_num_heads=model.num_heads if tp_shardmap else None)

    # multi-host: only process 0 writes shared-output_dir artifacts
    is_writer = jax.process_index() == 0
    if is_writer:
        save_args(args.output_dir, args)
    trainable, total = opt.count_trainable(state["params"])
    print(f"Params: {total / 1e6:.1f}M ({trainable / 1e6:.1f}M trainable)")

    import contextlib

    from mirage_tpu.utils.profiling import trace

    debug_fwd = None
    t_start = time.time()
    for epoch in range(start_epoch, args.epochs):
        stack = contextlib.ExitStack()
        if args.profile_dir and epoch == start_epoch:
            stack.enter_context(trace(args.profile_dir))
        loader.set_epoch(epoch)
        logger = MetricLogger()
        it = epoch * steps_per_epoch
        for step, (batch, _, _ids) in enumerate(
                logger.log_every(loader, args.log_freq, f"Epoch [{epoch}]")):
            if step >= steps_per_epoch:
                break
            batch = {k: v for k, v in batch.items() if k in args.in_domains}
            batch = shard_batch(batch, mesh)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), it)
            state, metrics = step_fn(state, batch, rng,
                                     float(lr_sched[min(it, len(lr_sched) - 1)]),
                                     float(wd_sched[min(it, len(wd_sched) - 1)]))
            if step % args.log_freq == 0 or step == steps_per_epoch - 1:
                host = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(host["loss"]):
                    print(f"Loss is {host['loss']}, stopping training")
                    sys.exit(1)
                logger.update(lr=float(lr_sched[min(it, len(lr_sched) - 1)]), **host)
            if (args.debug_images and step == 0 and epoch % 20 == 0
                    and jax.process_count() == 1):
                # multi-host: the global batch spans non-addressable devices
                # (device_get would raise) and PNGs are a single-host debug
                # aid — skip rather than crash
                if debug_fwd is None:
                    # single-device debug forward: a tp model's in-block
                    # collectives only exist inside shard_map — strip tp
                    # (the host params get unrelayouted below to match)
                    dbg_model = dataclasses.replace(model, tp=None, pp=None) \
                        if (model.tp is not None or model.pp is not None) \
                        else model
                    debug_fwd = jax.jit(lambda p, b, r: dbg_model(
                        p, b, mask_inputs=True,
                        num_encoded_tokens=args.num_encoded_tokens, rng=r))
                # debug dumps need a handful of images: run unsharded on a
                # host copy (mesh-sharded operands would otherwise reach the
                # kernels outside shard_map — the Mosaic partitioning error)
                dbg_batch = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(jax.device_get(x)[:8]), batch)
                dbg_params = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(jax.device_get(x)),
                    state["params"]) if mesh.size > 1 else state["params"]
                if tp_shardmap:
                    from mirage_tpu.parallel.tp import tp_unrelayout

                    dbg_params = tp_unrelayout(dbg_params, model.num_heads,
                                               args.mesh_tensor)
                preds, masks = debug_fwd(dbg_params, dbg_batch,
                                         jax.random.PRNGKey(epoch))
                save_debug_images(args.output_dir, epoch, dbg_batch, preds,
                                  masks, args)
            it += 1
        stack.close()  # flush the profiler trace for the profiled epoch

        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            # state_to_host handles every placement: dp-replicated states
            # device_get directly; model-sharded shard_map states (fsdp/tp)
            # on multi-process meshes span non-addressable devices and are
            # gathered with a COLLECTIVE — so every process must call it
            # (outside the is_writer gate), while process 0 alone writes to
            # the shared output_dir (concurrent orbax writes / log appends
            # corrupt the artifacts)
            host_state = ckpt.state_to_host(state)
            if tp_shardmap:
                # undo the head-group-major qkv permutation so the saved
                # checkpoint keeps the standard [3, H, dh] layout (interop
                # with .pth conversion, resume on any mesh)
                from mirage_tpu.parallel.tp import tp_relayout_state

                host_state = tp_relayout_state(
                    host_state, model.num_heads, args.mesh_tensor,
                    invert=True)
            if is_writer:
                ckpt.save_checkpoint(args.output_dir, host_state, epoch,
                                     args=vars(args))
        if is_writer:
            append_log(args.output_dir, {
                "epoch": epoch,
                **{f"train_{k}": m.global_avg for k, m in logger.meters.items()},
            })

    total_time = time.time() - t_start
    if is_writer:
        with open(os.path.join(args.output_dir, "training_time.txt"), "w") as f:
            f.write(f"{total_time}\n")
    print(f"Training done in {total_time:.1f}s")
    return state


if __name__ == "__main__":
    main()
