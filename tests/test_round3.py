"""Round-3 fixes: reference freeze semantics in seg tuning (ADVICE r2 high),
restored CLI knobs (--learnable_pos_emb / --affine / batch floor), checkpoint
moment-layout reconcile, and the cls data-parallel mesh path."""

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_seg_model(**model_kw):
    from mirage_tpu.adapters import ConvNeXtAdapter, PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(16, 16),
                                        image_size=64)}
    outs = {"semseg": ConvNeXtAdapter(num_classes=4, embed_dim=256,
                                      preds_per_patch=16, patch_size=(16, 16),
                                      depth=1, task="bscan",
                                      image_size=(64, 64))}
    return MIRAGEModel(input_adapters=ins, output_adapters=outs,
                       dim_tokens=128, depth=2, num_heads=4, attn_impl="xla",
                       **model_kw)


def _seg_grads(model, opt, frozen_encoder, rng):
    from mirage_tpu.losses import ce_gdice_loss

    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 1, 64, 64)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 4, (2, 64, 64)), jnp.int32)

    def loss(p):
        preds = model.forward_light(opt.stop_frozen(p), {"bscan": x},
                                    frozen_encoder=frozen_encoder)
        return ce_gdice_loss(preds["semseg"].astype(jnp.float32), tgt)

    return jax.grad(loss)(params)


def test_seg_freeze_encoder_trains_input_adapters(rng):
    """Reference parity (optim_factory.py:184-190): freeze_encoder freezes
    ONLY the encoder blocks — input-adapter and global-token gradients flow
    through the frozen encoder and must be nonzero."""
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer

    model = _tiny_seg_model()
    opt = create_optimizer(OptimizerConfig(opt="adamw", freeze_encoder=True))
    meta = opt.meta(model.init_params(jax.random.PRNGKey(0)))["trainable"]
    assert meta["input_adapters"]["bscan"]["proj"]["w"] is True
    assert meta["global_tokens"] is True
    assert meta["encoder"]["attn"]["qkv"]["w"] is False

    grads = _seg_grads(model, opt, frozen_encoder=False, rng=rng)
    g_proj = np.abs(np.asarray(grads["input_adapters"]["bscan"]["proj"]["w"]))
    g_glob = np.abs(np.asarray(grads["global_tokens"]))
    assert g_proj.max() > 0, "input adapter got zero grads under freeze_encoder"
    assert g_glob.max() > 0, "global tokens got zero grads under freeze_encoder"
    # frozen encoder: stop_frozen eliminates dW
    assert float(np.abs(np.asarray(
        grads["encoder"]["attn"]["qkv"]["w"])).max()) == 0.0


def test_seg_full_freeze_fast_path_consistent(rng):
    """--freeze_input_adapters: adapters/global tokens are optimizer-frozen
    (no weight decay drift on zero-grad params) AND the encoder-output
    stop-grad is then legitimate."""
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer

    model = _tiny_seg_model()
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", freeze_encoder=True,
        frozen_paths=("input_adapters", "global_tokens")))
    params = model.init_params(jax.random.PRNGKey(0))
    meta = opt.meta(params)["trainable"]
    assert meta["input_adapters"]["bscan"]["proj"]["w"] is False
    assert meta["global_tokens"] is False
    assert meta["output_adapters"]["semseg"]["final_layer"]["w"] is True

    grads = _seg_grads(model, opt, frozen_encoder=True, rng=rng)
    # head still learns
    g_head = np.abs(np.asarray(grads["output_adapters"]["semseg"]["final_layer"]["w"]))
    assert g_head.max() > 0
    # frozen adapters: no update (and no wd decay) even across an opt step
    state_mu = opt.init(params)["mu"]
    assert np.ndim(state_mu["input_adapters"]["bscan"]["proj"]["w"]) == 0, \
        "frozen adapter should get scalar placeholder moments"


def test_learnable_pos_emb_optimizer_meta():
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer

    model = _tiny_seg_model()
    params = model.init_params(jax.random.PRNGKey(0))
    fixed = create_optimizer(OptimizerConfig(opt="adamw"))
    learn = create_optimizer(OptimizerConfig(opt="adamw", learnable_pos_emb=True))
    assert fixed.meta(params)["trainable"]["input_adapters"]["bscan"]["pos_emb"] is False
    assert learn.meta(params)["trainable"]["input_adapters"]["bscan"]["pos_emb"] is True
    # pos_emb stays in the no-decay set even when learnable (model no_weight_decay)
    assert learn.meta(params)["wd"]["input_adapters"]["bscan"]["pos_emb"] == 0.0


def test_seg_cli_accepts_new_flags():
    from mirage_tpu.cli.run_seg_tuning import get_parser

    args = get_parser().parse_args(
        ["--weights", "w", "--data_path", "d", "--learnable_pos_emb", "true",
         "--freeze_input_adapters"])
    assert args.learnable_pos_emb is True
    assert args.freeze_input_adapters is True
    args = get_parser().parse_args(["--weights", "w", "--data_path", "d"])
    assert args.learnable_pos_emb is False
    assert args.freeze_input_adapters is False


def test_ckpt_moment_layout_reconcile(tmp_path):
    """A checkpoint saved with different freeze flags restores: full-size
    moments collapse to the template's scalar placeholders and vice versa
    (ADVICE r2: freeze-flag changes must not brick resume)."""
    from mirage_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state

    model = _tiny_seg_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt_all = create_optimizer(OptimizerConfig(opt="adamw"))
    opt_frozen = create_optimizer(OptimizerConfig(opt="adamw", freeze_encoder=True))

    # save with everything trainable, restore into frozen template
    state = init_train_state(params, opt_all)
    save_checkpoint(str(tmp_path / "a"), jax.device_get(state), 0)
    tmpl = init_train_state(params, opt_frozen)
    restored, _ = load_checkpoint(str(tmp_path / "a" / "checkpoint-0"), tmpl)
    assert np.ndim(restored["opt"]["mu"]["encoder"]["attn"]["qkv"]["w"]) == 0
    assert restored["opt"]["mu"]["output_adapters"]["semseg"]["final_layer"]["w"].shape \
        == params["output_adapters"]["semseg"]["final_layer"]["w"].shape

    # save frozen, restore into all-trainable template (moments expand to 0)
    state_f = init_train_state(params, opt_frozen)
    save_checkpoint(str(tmp_path / "b"), jax.device_get(state_f), 0)
    restored2, _ = load_checkpoint(str(tmp_path / "b" / "checkpoint-0"),
                                   init_train_state(params, opt_all))
    enc_mu = np.asarray(restored2["opt"]["mu"]["encoder"]["attn"]["qkv"]["w"])
    assert enc_mu.shape == params["encoder"]["attn"]["qkv"]["w"].shape
    assert float(np.abs(enc_mu).max()) == 0.0


def test_cls_auto_batch_floor(tmp_path):
    """Tiny datasets floor the auto batch size at 8 (run_cls_tuning.py:239-245)."""
    import argparse

    from mirage_tpu.cli.run_cls_tuning import process_args

    for cls_name in ("a", "b"):
        d = tmp_path / "train" / cls_name
        d.mkdir(parents=True)
        (d / "x.png").touch()
    args = argparse.Namespace(data_root=str(tmp_path.parent),
                              data_set=tmp_path.name, batch_size=None)
    args = process_args(args)
    assert args.batch_size == 8


def test_weighted_cross_entropy_matches_sliced():
    """Padded rows with zero weight do not change the loss."""
    from mirage_tpu.losses.gdice import cross_entropy_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((6, 5, 1, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 5, (6, 1, 1)), jnp.int32)
    w = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    full = cross_entropy_loss(logits[:4], tgt[:4], label_smoothing=0.1)
    weighted = cross_entropy_loss(logits, tgt, label_smoothing=0.1, weights=w)
    np.testing.assert_allclose(float(weighted), float(full), rtol=1e-6)


def _make_cls_dataset(base: Path, n_train=10, n_val=4, n_test=4, size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        for c in ("healthy", "sick"):
            d = base / "TinySet" / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n // 2):
                offs = 64 if c == "sick" else 0
                img = (rng.random((size, size)) * 128 + offs).astype(np.uint8)
                Image.fromarray(img).save(d / f"{i}.png")


def test_cls_cli_sharded_end_to_end(tmp_path):
    """run_cls_tuning on the 8-device CPU mesh: sharded train steps (VERDICT
    r2 weak #6 — the cls CLI had no mesh path), ragged final batch padded
    with zero-weight rows, CSVs + best checkpoint written."""
    import pandas as pd

    from mirage_tpu.cli import run_cls_tuning

    _make_cls_dataset(tmp_path)
    # tiny wrapper-loadable weights (same recipe as test_cls_model_override)
    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.checkpoint import save_safetensors

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(8, 8),
                                        image_size=64)}
    core = MIRAGEModel(input_adapters=ins, output_adapters=None,
                       dim_tokens=192, depth=3, num_heads=4)
    save_safetensors(core.init_params(jax.random.PRNGKey(0)), core,
                     str(tmp_path / "mirage-base_tiny.safetensors"))

    out = tmp_path / "out"
    # batch 4 over 10 train samples -> final batch of 2 exercises padding;
    # batch 4 over data=8 mesh -> padded_bs rounds up to 8
    run_cls_tuning.main([
        "--data_root", str(tmp_path), "--data_set", "TinySet",
        "--weights", str(tmp_path / "mirage-base_tiny.safetensors"),
        "--model_override", "miragepre_tiny", "--input_size", "64",
        "--patch_size", "8", "--batch_size", "4", "--epochs", "2",
        "--dtype", "float32", "--num_workers", "0", "--early_start_from", "99",
        "--output_dir", str(out), "--no-affine",
    ])
    run_dirs = list((out / "v1" / "0" / "TinySet").iterdir())
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    assert (run_dir / "checkpoint-best").is_dir()
    for csv in ("train_eval.csv", "valid_eval.csv", "test_eval.csv"):
        df = pd.read_csv(run_dir / csv)
        assert len(df) > 0
        assert np.isfinite(df["Loss"]).all()


def test_cls_affine_flag_changes_hash(tmp_path):
    """--affine is part of the run identity (reference args-md5 includes it,
    run_cls_tuning.py:318)."""
    import argparse

    from mirage_tpu.cli.config import args_hash

    base = dict(affine=True, weights="w", lr=1e-3)
    a = args_hash(argparse.Namespace(**base), exclude=())
    base["affine"] = False
    b = args_hash(argparse.Namespace(**base), exclude=())
    assert a != b
