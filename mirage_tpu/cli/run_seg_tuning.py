"""Segmentation fine-tuning workload.

Parity: run_seg_tuning.py — frozen-encoder default, selectable head
{segmenter, convnext, dpt, linear}, losses CE / CE-ignore-bg (bg auto-detected
from INFO.json) / CEGDice, layer-wise LR decay 0.75, per-epoch mIoU/aAcc/mAcc
eval with best-checkpoint by val mIoU, test + prediction-PNG export via the
inverse label mapping, infer_only early-exit and already-inferred skip.

TPU-native: jitted train/eval steps over the data mesh; streaming histogram
metric accumulation on host (no full prediction lists in RAM); bf16 compute.

Usage:
  python -m mirage_tpu.cli.run_seg_tuning -c configs/seg_200e_convnext.yaml \
      --data_path /data/Segmentation/AROI --weights MIRAGE-Base.pth
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

from mirage_tpu.cli.config import (apply_platform_env, normalize_domain_sizes,
                                   parse_with_yaml, save_args, str2bool)

apply_platform_env()


def get_parser():
    p = argparse.ArgumentParser("MIRAGE segmentation tuning (TPU)", add_help=True)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--save_ckpt_freq", default=200, type=int)
    p.add_argument("--eval_freq", default=1, type=int)
    p.add_argument("--in_domains", default="bscan", type=str)
    p.add_argument("--decoder_main_tasks", default="bscan", type=str)
    p.add_argument("--num_global_tokens", default=1, type=int)
    p.add_argument("--patch_size", default=32, type=int)
    p.add_argument("--input_size", default=1024, type=int)
    p.add_argument("--drop_path_encoder", default=0.1, type=float)
    p.add_argument("--output_adapter", default="convnext",
                   choices=["segmenter", "convnext", "dpt", "linear"])
    p.add_argument("--decoder_interpolate_mode", default="bilinear",
                   choices=["bilinear", "nearest"])
    p.add_argument("--loss", default="CEGDice", choices=["CE", "CE-ignore-bg", "CEGDice"])
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=[0.9, 0.999], type=float, nargs="+")
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--weight_decay_end", default=None, type=float)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--warmup_lr", default=1e-6, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--warmup_epochs", default=1, type=int)
    p.add_argument("--warmup_steps", default=-1, type=int)
    p.add_argument("--layer_decay", default=0.75, type=float)
    p.add_argument("--freeze_encoder", default=True, type=str2bool)
    p.add_argument("--no_freeze_encoder", dest="freeze_encoder", action="store_false")
    p.add_argument("--freeze_input_adapters", default=False, action="store_true",
                   help="with --freeze_encoder: also freeze input adapters + "
                        "global tokens and skip the encoder backward entirely "
                        "(fast path, ~15%% step time; deviates from the "
                        "reference, which trains adapters through the frozen "
                        "encoder — optim_factory.py:184-190 freezes encoder "
                        "blocks only)")
    p.add_argument("--learnable_pos_emb", default=False, type=str2bool)
    p.add_argument("--no_learnable_pos_emb", dest="learnable_pos_emb",
                   action="store_false")
    p.add_argument("--remat", default=False, action="store_true",
                   help="encoder activation checkpointing (full-FT memory)")
    p.add_argument("--weights", required=True, type=str)
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--test_data_path", default=None, type=str)
    p.add_argument("--external", default=None, type=str,
                   help="name of an external test dataset: predictions go to "
                        "preds_{external} for run_seg_eval --external "
                        "(auto-detected for Duke_iAMD test paths, "
                        "run_seg_tuning.py:428-439)")
    p.add_argument("--output_dir", default="./output/seg", type=str)
    p.add_argument("--version", default="v1", type=str)
    p.add_argument("--minmax", default=True, type=str2bool)
    p.add_argument("--test", default=False, action="store_true")
    p.add_argument("--infer_only", default=False, action="store_true")
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--ignore_index", default=None, type=int)
    p.add_argument("--log_freq", default=20, type=int)
    p.add_argument("--max_steps_per_epoch", default=None, type=int)
    p.add_argument("--model_override", default=None, type=str,
                   help="bypass the weights-substring registry (e.g. miragepre_tiny)")
    return p


def process_args(args):
    args.in_domains = args.in_domains.split("-")
    normalize_domain_sizes(args, args.in_domains)
    args.data_path = Path(args.data_path)
    args.dataset_name = args.data_path.stem
    args.train_data_path = args.data_path / "train"
    args.eval_data_path = args.data_path / "val"
    if args.test and args.test_data_path is None:
        args.test_data_path = args.data_path / "test"
    # Cross-dataset transfer eval (reference run_seg_tuning.py:428-431): a
    # Duke_iAMD test path on an AROI-trained model exports to preds_Duke_iAMD
    # so run_seg_eval --external can apply the AROI->Duke-iAMD translator.
    if args.external is None and args.test and args.test_data_path is not None \
            and "Duke_iAMD" in str(args.test_data_path):
        args.external = "Duke_iAMD"

    # INFO.json: {"0": {"label": "background", "value": 0}, ...}
    info_path = args.data_path / "INFO.json"
    with open(info_path) as f:
        original = json.load(f)
    mapping = {}
    for k, v in original.items():
        if args.ignore_index is None and any(
                bg in v["label"].lower() for bg in ("background", "bg")):
            args.ignore_index = int(k)
        mapping[v["value"]] = int(k)
    args.mapping = mapping
    args.inverse_mapping = {v: k for k, v in mapping.items()}
    args.num_classes = len(mapping)

    out = Path(args.output_dir) / args.version / args.dataset_name
    name = Path(args.weights).stem
    if args.freeze_encoder:
        name += "_frozen"
    if args.freeze_encoder and args.freeze_input_adapters:
        name += "_fia"  # non-reference fast path: distinct checkpoint dir
    if args.learnable_pos_emb:
        name += "_lpe"
    name += f"_{args.output_adapter}_{args.loss}"
    if args.minmax:
        name += "_minmax"
    args.output_dir = str(out / name)
    args.out_domains = ["semseg"]
    args.all_domains = sorted(set(args.in_domains) | {"semseg"})
    return args


def build_model(args, fm):
    import jax.numpy as jnp

    from mirage_tpu.adapters import (ConvNeXtAdapter, DPTOutputAdapter,
                                     LinearSegAdapter, PatchedInputAdapter,
                                     SegmenterMaskTransformerAdapter,
                                     SemSegInputAdapter)
    from mirage_tpu.models.mirage import model_factory

    conf = fm.domain_conf()
    input_adapters = {}
    for d in args.in_domains:
        c = conf[d]
        if c["semseg"]:
            input_adapters[d] = SemSegInputAdapter(
                num_classes=c["num_classes"], stride_level=c["stride_level"],
                patch_size_full=args.patch_size[d], dim_class_emb=c["dim_class_emb"],
                emb_padding_idx=c.get("emb_padding_idx"),
                image_size=args.input_size[d])
        else:
            input_adapters[d] = PatchedInputAdapter(
                num_channels=c["channels"], stride_level=c["stride_level"],
                patch_size_full=args.patch_size[d], image_size=args.input_size[d],
                learnable_pos_emb=args.learnable_pos_emb)

    main_tasks = tuple(args.decoder_main_tasks.split("-"))
    head_factory = {
        "segmenter": partial(SegmenterMaskTransformerAdapter, main_tasks=main_tasks,
                             embed_dim=768),
        "convnext": partial(ConvNeXtAdapter, preds_per_patch=16, depth=4,
                            interpolate_mode=args.decoder_interpolate_mode,
                            main_tasks=main_tasks, embed_dim=6144),
        "dpt": partial(DPTOutputAdapter, stride_level=1, main_tasks=main_tasks,
                       head_type="semseg"),
        "linear": partial(LinearSegAdapter,
                          interpolate_mode=args.decoder_interpolate_mode,
                          main_tasks=main_tasks),
    }
    model_name = args.model_override or fm.model
    if model_name != "miragelight_base" and args.output_adapter == "dpt" \
            and not args.model_override:
        raise NotImplementedError("DPT head is configured for ViT-B only")
    output_adapters = {"semseg": head_factory[args.output_adapter](
        num_classes=args.num_classes,
        patch_size=args.patch_size[args.in_domains[0]],
        task="semseg", image_size=args.input_size[args.in_domains[0]])}

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    return model_factory[model_name](
        input_adapters, output_adapters, num_global_tokens=args.num_global_tokens,
        drop_path_rate=args.drop_path_encoder, compute_dtype=dtype,
        remat=args.remat)


def make_criterion(args):
    from mirage_tpu.losses import ce_gdice_loss, cross_entropy_loss

    if args.loss == "CE":
        return lambda logits, tgt: cross_entropy_loss(logits, tgt)
    if args.loss == "CE-ignore-bg":
        if args.ignore_index is None:
            raise ValueError("Ignore index is not set")
        return lambda logits, tgt: cross_entropy_loss(
            logits, tgt, ignore_index=args.ignore_index)
    return lambda logits, tgt: ce_gdice_loss(logits, tgt)


def main(argv=None):
    args = process_args(parse_with_yaml(get_parser(), argv))

    import jax
    import jax.numpy as jnp

    from mirage_tpu.api.fm_configs import pick_fm, seg_fm_factory
    from mirage_tpu.data import DataLoader, MultiTaskImageFolder, SemSegTransform
    from mirage_tpu.metrics.semseg import SegMetricAccumulator
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train import checkpoint as ckpt
    from mirage_tpu.train.logger import MetricLogger, append_log
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.schedules import cosine_scheduler
    from mirage_tpu.train.steps import (init_train_state, make_train_step,
                                        shard_batch, shard_state)

    # idempotence guards (run_seg_tuning.py:1123-1134): skip finished
    # trainings; require a best checkpoint before test-only runs
    best_dir = Path(args.output_dir) / "checkpoint-best"
    final_dir = Path(args.output_dir) / f"checkpoint-{args.epochs - 1}"
    if not args.test and best_dir.is_dir() and final_dir.is_dir():
        print("Model already trained. Skipping...")
        return
    if args.test and not best_dir.is_dir():
        raise SystemExit("ERROR: Model not fully trained (no checkpoint-best)")

    fm = pick_fm(seg_fm_factory, args.weights)
    if args.minmax:
        fm.norm = "minmax"
    print(f">> FM config: {type(fm).__name__} (norm={fm.norm}, model={fm.model})")

    input_size = args.input_size[args.in_domains[0]][0]
    train_tf = SemSegTransform(train=True, input_size=input_size, norm=fm.norm)
    val_tf = SemSegTransform(train=False, input_size=input_size, norm=fm.norm)

    dataset_train = MultiTaskImageFolder(
        str(args.train_data_path), args.all_domains, mapping=args.mapping,
        transform=train_tf)
    dataset_val = MultiTaskImageFolder(
        str(args.eval_data_path), args.all_domains, mapping=args.mapping,
        transform=val_tf)
    print(f"Training on {len(dataset_train)}, validating on {len(dataset_val)}")
    dataset_test = None
    if args.test_data_path is not None and Path(args.test_data_path).exists():
        dataset_test = MultiTaskImageFolder(
            str(args.test_data_path), args.all_domains, mapping=args.mapping,
            transform=val_tf)

    preds_dir = Path(args.output_dir) / (
        f"preds_{args.external}" if args.external else "preds")
    if (args.infer_only and args.test and dataset_test is not None
            and preds_dir.is_dir()
            and len(list(preds_dir.iterdir())) == len(dataset_test)):
        print("Inference already done. Skipping...")
        return

    model = build_model(args, fm)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    params = fm.load(params, model, args.weights)

    # Reference freeze_encoder freezes ONLY the encoder blocks
    # (optim_factory.py:184-190): input adapters and global tokens keep
    # training, their gradients flowing through the frozen blocks. The
    # opt-in --freeze_input_adapters fast path freezes those too, which
    # lets forward_light stop-grad at the encoder OUTPUT and skip the
    # encoder backward scan altogether.
    full_freeze = args.freeze_encoder and args.freeze_input_adapters
    opt = create_optimizer(OptimizerConfig(
        opt=args.opt, betas=tuple(args.opt_betas), eps=args.opt_eps,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        layer_decay=args.layer_decay if args.layer_decay < 1.0 else None,
        num_layers=model.depth, freeze_encoder=args.freeze_encoder,
        frozen_paths=("input_adapters", "global_tokens") if full_freeze else (),
        learnable_pos_emb=args.learnable_pos_emb))

    mesh = make_mesh()
    if args.batch_size % mesh.size:
        sys.exit(f"--batch_size {args.batch_size} must be divisible by the "
                 f"{mesh.size} devices (shard_map dp step needs even shards)")
    return_all_layers = args.output_adapter == "dpt"
    criterion = make_criterion(args)

    def loss_fn(params_, batch, rng):
        inputs = {k: v for k, v in batch.items() if k in args.in_domains}
        preds = model.forward_light(params_, inputs,
                                    return_all_layers=return_all_layers,
                                    deterministic=False, rng=rng,
                                    frozen_encoder=full_freeze)
        logits = preds["semseg"].astype(jnp.float32)
        if logits.shape[-2:] != batch["semseg"].shape[-2:]:
            from mirage_tpu.nn.resize import resize2d

            logits = resize2d(logits, batch["semseg"].shape[-2:], mode="bilinear")
        loss = criterion(logits, batch["semseg"])
        return loss, {}

    step_fn = make_train_step(loss_fn, opt, mesh=mesh)

    def eval_body(params_, batch):
        inputs = {k: v for k, v in batch.items() if k in args.in_domains}
        preds = model.forward_light(params_, inputs,
                                    return_all_layers=return_all_layers)
        logits = preds["semseg"].astype(jnp.float32)
        if logits.shape[-2:] != batch["semseg"].shape[-2:]:
            from mirage_tpu.nn.resize import resize2d

            logits = resize2d(logits, batch["semseg"].shape[-2:], mode="bilinear")
        loss = criterion(logits, batch["semseg"])
        return logits.argmax(axis=1), loss

    if mesh.size > 1:
        # shard_map (not GSPMD): the kernel-bearing eval must be manually
        # partitioned on a multi-chip mesh (parallel/mesh.dp_shard_map note)
        from jax.sharding import PartitionSpec as P

        ax = ("data", "fsdp")

        def eval_local(params_, batch):
            preds, loss = eval_body(params_, batch)
            return preds, jax.lax.pmean(loss, ax)

        eval_fn = jax.jit(jax.shard_map(
            eval_local, mesh=mesh, in_specs=(P(), P(ax)),
            out_specs=(P(ax), P()), check_vma=False))
    else:
        eval_fn = jax.jit(eval_body)

    loader_train = DataLoader(dataset_train, args.batch_size, shuffle=True,
                              drop_last=True, num_workers=args.num_workers,
                              seed=args.seed)
    loader_val = DataLoader(dataset_val, args.batch_size, num_workers=args.num_workers)
    steps_per_epoch = len(loader_train)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)

    lr_sched = cosine_scheduler(args.lr, args.min_lr, args.epochs, steps_per_epoch,
                                warmup_epochs=args.warmup_epochs,
                                start_warmup_value=args.warmup_lr,
                                warmup_steps=args.warmup_steps)
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_sched = cosine_scheduler(1.0, wd_end / max(args.weight_decay, 1e-12),
                                args.epochs, steps_per_epoch)

    state = init_train_state(params, opt)
    del params
    start_epoch = 0
    if not args.test:
        state, start_epoch = ckpt.auto_load_checkpoint(args.output_dir, state)

    save_args(args.output_dir, args)
    trainable, total = opt.count_trainable(state["params"])
    print(f"Params: {total / 1e6:.1f}M total, {trainable / 1e6:.2f}M trainable"
          f" (freeze_encoder={args.freeze_encoder})")

    lut = np.zeros(args.num_classes, np.uint8)
    for idx, value in args.inverse_mapping.items():
        lut[idx] = value

    def save_panel(batch, pred, epoch, mode):
        """input | prediction | GT debug panel (run_seg_tuning.py:826-855)."""
        from PIL import Image

        img = np.asarray(batch[args.in_domains[0]][0])
        img = img[0] if img.ndim == 3 else img
        u8 = lambda a: ((a - a.min()) / max(a.max() - a.min(), 1e-12) * 255).astype(np.uint8)
        panel = np.concatenate([u8(img), u8(pred[0].astype(np.float32)),
                                u8(np.asarray(batch["semseg"][0], np.float32))], axis=1)
        d = Path(args.output_dir) / "val_images"
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(panel).save(d / f"e{epoch:04d}_{mode}.png")

    def evaluate(params_, loader, mode="val", epoch=0, save_preds=False):
        if mesh.size > 1:
            # host-loaded params (best-ckpt/external paths) must be
            # replicated onto the mesh for the shard_map eval
            from mirage_tpu.parallel.mesh import replicate

            params_ = replicate(params_, mesh)
        logger = MetricLogger()
        acc = SegMetricAccumulator(args.num_classes, ignore_index=255)
        if save_preds:
            preds_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        step_to_save = int(np.random.default_rng(epoch).integers(0, max(len(loader), 1)))
        for step_i, (batch, _, sids) in enumerate(loader):
            n = len(next(iter(batch.values())))
            pad = (-n) % mesh.size  # shard_map eval needs a device multiple
            if pad:
                batch = {k: np.concatenate(
                    [v, np.broadcast_to(v[:1], (pad,) + v.shape[1:])])
                    for k, v in batch.items()}
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            pred, loss = eval_fn(params_, jb)
            pred = np.asarray(pred)[:n]
            batch = {k: v[:n] for k, v in batch.items()}
            if not args.infer_only and step_i == step_to_save:
                save_panel(batch, pred, epoch if isinstance(epoch, int) else 0, mode)
            if save_preds:
                for i, sid in enumerate(sids):
                    Image.fromarray(lut[pred[i]]).save(preds_dir / f"{sid}.png")
            if not args.infer_only:
                acc.update(pred, np.asarray(batch["semseg"]))
                if pad == 0:
                    # the pmean'd loss of a padded batch includes the
                    # duplicate rows — skip it for the (logging-only) loss
                    # meter; mIoU/Dice come from the exactly-sliced preds
                    logger.update(loss=float(loss))
        if args.infer_only:
            print("Inference done. Exiting...")
            sys.exit(0)
        all_acc, cls_acc, iou = acc.compute(["mIoU"])
        stats = {"loss": logger.meters["loss"].global_avg if logger.meters else 0.0,
                 "mean_iou": float(np.nanmean(iou)),
                 "pixel_accuracy": float(all_acc),
                 "mean_accuracy": float(np.nanmean(cls_acc))}
        print(f"[{mode} e{epoch}] mIoU {stats['mean_iou']:.4f} "
              f"aAcc {stats['pixel_accuracy']:.4f} "
              f"mAcc {stats['mean_accuracy']:.4f} loss {stats['loss']:.4f}")
        return stats

    if args.test:
        state = ckpt.load_best_checkpoint(args.output_dir, state)
        loader_test = DataLoader(dataset_test, args.batch_size,
                                 num_workers=args.num_workers)
        stats = evaluate(state["params"], loader_test, mode="test",
                         save_preds=True)
        append_log(args.output_dir, {f"test/{k}": v for k, v in stats.items()})
        return stats

    state = shard_state(state, mesh)
    print(f"Start training for {args.epochs} epochs")
    t0 = time.time()
    max_miou = 0.0
    for epoch in range(start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        logger = MetricLogger()
        it = epoch * steps_per_epoch
        for step, (batch, _, _sids) in enumerate(
                logger.log_every(loader_train, args.log_freq,
                                 f"{args.dataset_name} e[{epoch}]")):
            if step >= steps_per_epoch:
                break
            batch = shard_batch(batch, mesh)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), it)
            state, metrics = step_fn(state, batch, rng,
                                     float(lr_sched[min(it, len(lr_sched) - 1)]),
                                     float(wd_sched[min(it, len(wd_sched) - 1)]))
            if step % args.log_freq == 0 or step == steps_per_epoch - 1:
                host = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(host["loss"]):
                    print(f"Loss is {host['loss']}, stopping")
                    sys.exit(1)
                logger.update(**host)
            it += 1

        log_stats = {"epoch": epoch,
                     **{f"train/{k}": m.global_avg for k, m in logger.meters.items()}}
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            ckpt.save_checkpoint(args.output_dir, jax.device_get(state), epoch,
                                 args=vars(args))
        if epoch % args.eval_freq == 0 or epoch == args.epochs - 1:
            stats = evaluate(state["params"], loader_val, epoch=epoch)
            if stats["mean_iou"] > max_miou:
                max_miou = stats["mean_iou"]
                ckpt.save_checkpoint(args.output_dir, jax.device_get(state),
                                     epoch, tag="best", args=vars(args))
            print(f"Max mIoU: {max_miou:.4f}")
            log_stats.update({f"val/{k}": v for k, v in stats.items()})
        append_log(args.output_dir, log_stats)

    print(f"Training time {time.time() - t0:.1f}s")

    if dataset_test is not None:
        print("Testing with best checkpoint")
        host_state = jax.device_get(state)
        host_state = ckpt.load_best_checkpoint(args.output_dir, host_state)
        loader_test = DataLoader(dataset_test, args.batch_size,
                                 num_workers=args.num_workers)
        stats = evaluate(host_state["params"], loader_test, mode="test",
                         save_preds=True)
        append_log(args.output_dir, {f"test/{k}": v for k, v in stats.items()})
    return max_miou


if __name__ == "__main__":
    main()
