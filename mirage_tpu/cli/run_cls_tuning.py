"""Classification tuning workload.

Parity: run_cls_tuning.py — linear-probe (lr 1e-3, all but head frozen) or
full fine-tune (lr 1e-5), AdamW wd 1e-2, per-iteration half-cycle cosine LR,
label-smoothing CE (0.1), dual-metric early stopping (BAcc then loss,
patience 20 from epoch 20), best model kept in memory and written once,
BAcc/AUROC/AP/F1/MCC -> CSVs, predictions.npz export, auto num_classes and
batch size from the dataset folder.

Usage:
  python -m mirage_tpu.cli.run_cls_tuning --data_root /data/Classification \
      --data_set OCTID --weights MIRAGE-Base.pth --linear_probing
"""

import argparse
import os
import time
from functools import partial
from pathlib import Path

import numpy as np

from mirage_tpu.cli.config import apply_platform_env, parse_with_yaml, save_args

apply_platform_env()

# CSV schema keyed into compute_cls_metrics' dict (never by dict order)
VAL_KEYS = ["epoch", "loss", "bacc", "auroc", "ap", "f1", "mcc"]
VAL_COLS = ["Epoch", "Loss", "BAcc", "AUROC", "AP", "F1-score", "MCC"]


def get_parser():
    p = argparse.ArgumentParser("MIRAGE classification tuning (TPU)", add_help=True)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--data_root", required=True, type=str)
    p.add_argument("--data_set", required=True, type=str)
    p.add_argument("--weights", required=True, type=str)
    p.add_argument("--pool", default="global", choices=["global", "cls", "token_mix"])
    p.add_argument("--linear_probing", default=False, action="store_true")
    p.add_argument("--input_size", default=None, type=int,
                   help="default: 512 for MIRAGE, 224 for SOTA ViT baselines")
    p.add_argument("--patch_size", default=32, type=int)
    p.add_argument("--smoothing", default=0.1, type=float)
    p.add_argument("--warmup_epochs", default=5, type=int)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--weight_decay", default=1e-2, type=float)
    p.add_argument("--val_metric", default="bacc", type=str)
    p.add_argument("--val_metric_two", default="loss", type=str)
    p.add_argument("--early_stopping_epochs", default=20, type=int)
    p.add_argument("--early_stopping_delta", default=0.0, type=float)
    p.add_argument("--early_stopping_delta_two", default=0.0, type=float)
    p.add_argument("--early_start_from", default=20, type=int)
    p.add_argument("--fill", default=None, type=float,
                   help="affine fill value; default: 1 for Kermany, else 0 "
                        "(fm_cls_config.py:51-56); 0.5 = random in-range "
                        "fill per image (transforms.py:125-126)")
    p.add_argument("--affine", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="random affine train transform "
                        "(run_cls_tuning.py:187-191)")
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--output_dir", default="./output/cls", type=str)
    p.add_argument("--version", default="v1", type=str)
    p.add_argument("--eval", default=False, action="store_true")
    p.add_argument("--save_predictions", default=False, action="store_true")
    p.add_argument("--max_steps_per_epoch", default=None, type=int)
    p.add_argument("--model_override", default=None, type=str)
    return p


def process_args(args):
    args.data_path = os.path.join(args.data_root, args.data_set)
    train_dir = Path(args.data_path) / "train"
    classes = [d for d in train_dir.iterdir() if d.is_dir()]
    args.num_classes = len(classes)
    num_samples = sum(len(list(d.iterdir())) for d in classes)
    if args.batch_size is None:
        # closest power of 2 to a quarter of the dataset, capped at 64; tiny
        # datasets floor at 8 (run_cls_tuning.py:239-245: 2**-1 < 1 -> 8)
        n = int(round(num_samples * 0.25)).bit_length() - 1
        args.batch_size = min(64, 2 ** n) if n >= 0 else 8
    print(f"Classes: {args.num_classes}, samples: {num_samples}, "
          f"batch: {args.batch_size}")
    return args


def main(argv=None):
    args = process_args(parse_with_yaml(get_parser(), argv))

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from mirage_tpu.api.fm_configs import cls_fm_factory, pick_fm
    from mirage_tpu.cli.config import args_hash
    from mirage_tpu.data import DataLoader
    from mirage_tpu.data.folder import ImageFolder
    from mirage_tpu.losses.gdice import cross_entropy_loss
    from mirage_tpu.metrics import compute_cls_metrics
    from mirage_tpu.train import checkpoint as ckpt
    from mirage_tpu.train.early_stop import EarlyStopping
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.logger import MetricLogger, append_log
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.schedules import adjust_learning_rate
    from mirage_tpu.train.steps import init_train_state, shard_batch, shard_state

    fm = pick_fm(cls_fm_factory, args.weights, linear_probing=args.linear_probing)
    if args.fill is None:
        # reference default: white fill for Kermany (bright-background OCT
        # exports), black otherwise (fm_cls_config.py:51-56)
        args.fill = 1.0 if "kermany" in args.data_set.lower() else 0.0
    if args.lr is None:
        args.lr = fm.lr
    if args.input_size is None:
        args.input_size = fm.default_input_size
    print(f">> {'Linear probing' if args.linear_probing else 'Full finetune'}"
          f" lr={args.lr} input_size={args.input_size}")

    model_name = type(fm).__name__
    # args-md5 suffix over the model-config whitelist so runs differing only
    # in those flags get distinct dirs, while --eval reruns resolve the same
    # one (run_cls_tuning.py:314-327)
    hash_keys = ("affine", "early_start_from", "early_stopping_delta",
                 "early_stopping_delta_two", "early_stopping_epochs", "fill",
                 "weights", "input_size", "linear_probing", "lr", "min_lr",
                 "pool", "smoothing", "val_metric", "val_metric_two",
                 "warmup_epochs", "weight_decay")
    if args.affine:
        # at its default (True) 'affine' must not perturb the hash: runs
        # trained before the flag existed would otherwise resolve --eval /
        # resume to a fresh empty directory (ADVICE r3)
        hash_keys = tuple(k for k in hash_keys if k != "affine")
    exclude = tuple(k for k in vars(args) if k not in hash_keys)
    args.output_dir = os.path.join(
        args.output_dir, args.version, str(args.seed), args.data_set,
        model_name + ("_linear" if args.linear_probing else "_finetune")
        + "_" + args_hash(args, exclude=exclude))
    os.makedirs(args.output_dir, exist_ok=True)
    save_args(args.output_dir, args)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cls = fm.build_model(num_classes=args.num_classes, pool=args.pool,
                         weights=args.weights, input_size=args.input_size,
                         patch_size=args.patch_size, compute_dtype=dtype,
                         model_override=args.model_override)

    datasets = {}
    loaders = {}
    for subset in ["train", "val", "test"]:
        path = Path(args.data_path) / subset
        if not path.exists():
            continue
        tf = fm.build_transform(train=(subset == "train"),
                                input_size=args.input_size, fill=args.fill,
                                affine=args.affine)
        datasets[subset] = ImageFolder(str(path), transform=tf)
        loaders[subset] = DataLoader(
            datasets[subset], args.batch_size, shuffle=(subset == "train"),
            drop_last=False, num_workers=args.num_workers, seed=args.seed)
        print(f"{subset}: {len(datasets[subset])} samples")

    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.999), eps=1e-8,
        weight_decay=args.weight_decay,
        frozen_paths=("model", "norm") if args.linear_probing else ()))

    # Data-parallel mesh (SURVEY §2.5): batch sharded over all devices,
    # params/moments replicated; the kernel-bearing steps go through
    # shard_map on multi-device meshes (see below). Created before the step
    # builders, which branch on mesh.size.
    mesh = make_mesh()

    def loss_fn(params, images, targets, weights, rng, axes=None):
        logits = cls.apply(params, images, deterministic=False, rng=rng,
                           frozen_encoder=args.linear_probing)
        # sum-form CE: on a sharded step the weighted normalization must use
        # the GLOBAL weight total (per-shard weighted means don't recombine
        # — the zero-weight padding rows all land on the last shard)
        s, w = cross_entropy_loss(logits[..., None, None],
                                  targets[..., None, None],
                                  label_smoothing=args.smoothing,
                                  weights=weights, normalize=False)
        if axes is not None:
            s, w = jax.lax.psum((s, w), axes)
        return s / jnp.maximum(w, 1.0), logits

    def train_body(state, images, targets, weights, rng, lr, axes=None):
        def wrapped(params, images, targets, rng):
            # frozen leaves (linear probing) get stop_gradient: no dW compute
            return loss_fn(opt.stop_frozen(params), images, targets, weights,
                           rng, axes=axes)

        (loss, logits), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state["params"], images, targets, rng)
        if axes is not None:
            # the in-loss psum makes per-shard grads PARTIAL contributions
            # of the already-globally-normalized loss: sum, don't average
            grads = jax.lax.psum(grads, axes)
        params, opt_state, gnorm = opt.update(grads, state["opt"],
                                              state["params"], lr)
        state = {"params": params, "opt": opt_state, "step": state["step"] + 1}
        return state, loss, logits, gnorm

    def eval_body(params, images):
        logits = cls.apply(params, images)
        return jax.nn.softmax(logits, axis=-1), logits

    if mesh.size > 1:
        # shard_map, not GSPMD: kernel-bearing steps must be manually
        # partitioned on a multi-chip mesh (parallel/mesh.dp_shard_map note);
        # params/opt replicated, batch + per-example weights sharded
        from jax.sharding import PartitionSpec as P

        ax = ("data", "fsdp")

        def train_local(state, images, targets, weights, rng, lr):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
            return train_body(state, images, targets, weights, rng, lr,
                              axes=ax)

        train_step = jax.jit(jax.shard_map(
            train_local, mesh=mesh,
            in_specs=(P(), P(ax), P(ax), P(ax), P(), P()),
            out_specs=(P(), P(), P(ax), P()), check_vma=False),
            donate_argnums=(0,))
        from mirage_tpu.parallel.mesh import dp_shard_map

        eval_step = jax.jit(dp_shard_map(eval_body, mesh, n_batch_args=1))
    else:
        train_step = jax.jit(train_body, donate_argnums=(0,))
        eval_step = jax.jit(eval_body)

    def evaluate(params, loader, epoch, mode="Valid", save_predictions=False):
        if mesh.size > 1:
            # host-loaded params (--eval / best-ckpt paths) must be
            # replicated onto the mesh for the shard_map eval
            from mirage_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        probs_all, targets_all, losses = [], [], []
        for images, targets, _sids in loader:
            n = len(images)
            pad = (-n) % mesh.size  # shard_map eval needs a device multiple
            if pad:
                images = np.concatenate(
                    [images, np.broadcast_to(images[:1],
                                             (pad,) + images.shape[1:])])
            probs, logits = eval_step(params, jnp.asarray(images))
            probs, logits = probs[:n], logits[:n]
            loss = float(cross_entropy_loss(
                jnp.asarray(logits)[..., None, None],
                jnp.asarray(targets)[..., None, None]))
            losses.append(loss)
            probs_all.append(np.asarray(probs))
            targets_all.append(np.asarray(targets))
        probs_all = np.concatenate(probs_all)
        targets_all = np.concatenate(targets_all)
        if save_predictions:
            np.savez_compressed(
                os.path.join(args.output_dir, "predictions.npz"),
                true_label_decode_list=targets_all,
                prediction_decode_list=probs_all.argmax(1),
                true_label_onehot_list=np.eye(args.num_classes)[targets_all],
                prediction_list=probs_all)
            return None
        m = compute_cls_metrics(targets_all, probs_all,
                                loss=float(np.mean(losses)), epoch=epoch)
        print(f"[{mode}] epoch {epoch} loss {m['loss']:.4f} bacc {m['bacc']:.4f}"
              f" auroc {m['auroc']:.4f} f1 {m['f1']:.4f} mcc {m['mcc']:.4f}")
        return m

    state = init_train_state(cls.params, opt)

    # Ragged final batches (drop_last=False, run_cls_tuning.py:268-272) are
    # padded to a fixed shape with zero-weight rows — exact loss/grads, no
    # per-shape recompiles.
    ndata = int(np.prod([mesh.shape[a] for a in ("data", "fsdp")
                         if a in mesh.shape]))
    padded_bs = -(-args.batch_size // max(ndata, 1)) * max(ndata, 1)

    def pad_batch(images, targets):
        images = np.asarray(images)
        targets = np.asarray(targets)
        n = images.shape[0]
        w = np.zeros((padded_bs,), np.float32)
        w[:n] = 1.0
        if n < padded_bs:
            pad = padded_bs - n
            images = np.concatenate(
                [images, np.broadcast_to(images[:1], (pad,) + images.shape[1:])])
            targets = np.concatenate(
                [targets, np.broadcast_to(targets[:1], (pad,) + targets.shape[1:])])
        return images, targets, w

    if args.eval or args.save_predictions:
        state = ckpt.load_best_checkpoint(args.output_dir, state)
        stats = evaluate(state["params"], loaders["test"], "Best", mode="Test",
                         save_predictions=args.save_predictions)
        if stats is not None:
            pd.DataFrame([[stats[k] for k in VAL_KEYS]], columns=VAL_COLS).to_csv(
                os.path.join(args.output_dir, "test_eval.csv"), index=False)
        return stats

    early = EarlyStopping(
        patience=args.early_stopping_epochs, delta=args.early_stopping_delta,
        delta_two=args.early_stopping_delta_two,
        greater_is_better=args.val_metric != "loss",
        greater_is_better_two=args.val_metric_two != "loss",
        start_from=args.early_start_from)

    state = shard_state(state, mesh)
    steps_per_epoch = len(loaders["train"])
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    best_state = None
    best_epoch = -1
    train_rows, val_rows = [], []
    t0 = time.time()
    stop = False
    for epoch in range(args.epochs):
        loaders["train"].set_epoch(epoch)
        logger = MetricLogger()
        preds_ep, tgts_ep = [], []
        for step, (images, targets, _sids) in enumerate(loaders["train"]):
            if step >= steps_per_epoch:
                break
            lr = adjust_learning_rate(args.lr, args.min_lr,
                                      epoch + step / steps_per_epoch,
                                      args.epochs, args.warmup_epochs)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1),
                                     epoch * steps_per_epoch + step)
            n_real = np.asarray(images).shape[0]
            images, targets, weights = pad_batch(images, targets)
            sb = shard_batch({"images": images, "targets": targets,
                              "weights": weights}, mesh)
            state, loss, logits, gnorm = train_step(
                state, sb["images"], sb["targets"], sb["weights"], rng, lr)
            loss = float(loss)
            if not np.isfinite(loss):
                print("Non-finite training loss; early stopping")
                stop = True
                break
            logger.update(loss=loss, lr=lr, grad_norm=float(gnorm))
            preds_ep.append(np.asarray(logits)[:n_real].argmax(1))
            tgts_ep.append(np.asarray(targets)[:n_real])
        if stop:
            break
        from sklearn.metrics import balanced_accuracy_score, f1_score

        y, yh = np.concatenate(tgts_ep), np.concatenate(preds_ep)
        train_rows.append([epoch, logger.meters["loss"].global_avg,
                           balanced_accuracy_score(y, yh),
                           f1_score(y, yh, average="weighted", zero_division=0.0)])
        print(f"[Train] epoch {epoch} loss {train_rows[-1][1]:.4f} "
              f"bacc {train_rows[-1][2]:.4f}")

        if "val" not in loaders:
            # no val split: keep training full-length, track latest as best
            best_state = jax.device_get(state)
            best_epoch = epoch
            append_log(args.output_dir, {"epoch": epoch,
                                         "train_loss": train_rows[-1][1]})
            continue
        stats = evaluate(state["params"], loaders["val"], epoch)
        val_rows.append([stats[k] for k in VAL_KEYS])
        is_best = early(stats[args.val_metric], stats[args.val_metric_two], epoch)
        if early.early_stop:
            print(f"Early stopping @ epoch {epoch}")
            break
        if is_best:
            best_state = jax.device_get(state)
            best_epoch = epoch
            print(f"New best model @ epoch {epoch} "
                  f"({early.best_value:.4f}, {early.best_value_two:.4f})")
        append_log(args.output_dir, {"epoch": epoch,
                                     "train_loss": train_rows[-1][1],
                                     **{f"val_{k}": v for k, v in stats.items()
                                        if k not in ("epoch",)}})

    if best_state is None:
        best_state = jax.device_get(state)
        best_epoch = args.epochs - 1
    ckpt.save_checkpoint(args.output_dir, best_state, best_epoch, tag="best",
                         args=vars(args))
    print(f"Training time {time.time() - t0:.1f}s")

    pd.DataFrame(train_rows, columns=["Epoch", "Loss", "BAcc", "F1-score"]).to_csv(
        os.path.join(args.output_dir, "train_eval.csv"), index=False)
    pd.DataFrame(val_rows, columns=VAL_COLS).to_csv(
        os.path.join(args.output_dir, "valid_eval.csv"), index=False)

    if "test" in loaders:
        stats = evaluate(best_state["params"], loaders["test"], "Best", mode="Test")
        pd.DataFrame([[stats[k] for k in VAL_KEYS]], columns=VAL_COLS).to_csv(
            os.path.join(args.output_dir, "test_eval.csv"), index=False)
        return stats
    return None


if __name__ == "__main__":
    main()
