"""Pretrain → downstream chain (VERDICT r4 weak #5).

The reference's actual workflow — run_pretraining.py writes checkpoint-N,
fm_seg_config.py:81-104 / fm_cls_config.py surgeries consume it in
run_seg_tuning.py:389-395 and run_cls_tuning.py — exercised as ONE chain:

  run_pretraining (tiny, 1 epoch)
    → orbax checkpoint-0
    → hf_push export (reference-key-namespace safetensors)
    → seg_checkpoint_surgery: every encoder/adapter key transplants (the
      overlay is strict=False, so a key mismatch would silently fall back
      to random init — asserted against here)
    → run_seg_tuning and run_cls_tuning warm starts reach finite losses.
"""

import json
from pathlib import Path

import numpy as np

import jax

from test_pretrain_cli import _make_data
from test_round3 import _make_cls_dataset
from test_seg_external import AROI_INFO, _write_split


def test_pretrain_to_downstream_chain(tmp_path):
    from mirage_tpu.api import convert
    from mirage_tpu.cli import (hf_push, run_cls_tuning, run_pretraining,
                                run_seg_tuning)

    # --- 1. pretraining: 1 tiny epoch, orbax checkpoint out -----------------
    rng = np.random.default_rng(0)
    data = tmp_path / "pretrain_data"
    _make_data(data, rng)
    pre_out = tmp_path / "pretrain_out"
    run_pretraining.main([
        "--in_domains", "bscan-slo-bscanlayermap",
        "--out_domains", "bscan-slo-bscanlayermap",
        "--model", "miragepre_tiny", "--decoder_dim", "64",
        "--decoder_depth", "1", "--decoder_num_heads", "4",
        "--input_size", "64", "--patch_size", "8",
        "--num_encoded_tokens", "48",
        "--warmup_epochs", "1", "--batch_size", "8", "--lr", "1e-3",
        "--save_ckpt_freq", "1", "--num_workers", "0", "--use_cache",
        "--dtype", "float32", "--data_path", str(data),
        "--output_dir", str(pre_out), "--epochs", "1",
    ])
    ckpt = pre_out / "checkpoint-0"
    assert ckpt.is_dir(), "pretraining checkpoint missing"

    # --- 2. export to the reference key namespace ---------------------------
    # (filename must contain 'mirage-base' for the fm registry pick,
    # api/fm_configs.pick_fm)
    weights = tmp_path / "mirage-base_chain.safetensors"
    hf_push.main(["-t", "export", "--weights", str(ckpt),
                  "--path", str(weights)])
    assert weights.is_file()

    # --- 3. surgery covers the namespace: nothing silently skipped ----------
    raw = convert.load_safetensors(str(weights))
    assert any(k.startswith("output_adapters.") for k in raw), \
        "export should carry the pretraining decoders"
    sd = convert.seg_checkpoint_surgery(raw)
    assert not any("output_adapters" in k for k in sd)
    # bscanlayermap (13 classes, run_pretraining DOMAIN_CONF) → semseg with
    # one appended padding row
    emb_pre = raw["input_adapters.bscanlayermap.class_emb.weight"]
    emb_post = sd["input_adapters.semseg.class_emb.weight"]
    assert emb_post.shape[0] == emb_pre.shape[0] + 1
    assert not any("bscanlayermap" in k for k in sd)

    # overlay transplants (not random-inits) the encoder: layer-0 qkv of the
    # overlaid stacked params must equal the exported tensor (transposed —
    # linears are stored (in, out))
    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel

    core = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(8, 8), image_size=64)},
        output_adapters=None, dim_tokens=192, depth=3, num_heads=4)
    init = core.init_params(jax.random.PRNGKey(7))
    loaded = convert.overlay_torch_params(init, sd, core)
    got = np.asarray(loaded["encoder"]["attn"]["qkv"]["w"])[0]
    want = np.asarray(sd["encoder.0.attn.qkv.weight"]).T
    np.testing.assert_array_equal(got, want)
    assert not np.array_equal(
        got, np.asarray(init["encoder"]["attn"]["qkv"]["w"])[0])

    # --- 4. seg tuning warm start -------------------------------------------
    segdata = tmp_path / "AROI"
    seg_rng = np.random.default_rng(1)
    aroi_values = [v["value"] for v in AROI_INFO.values()]
    for split, n in (("train", 8), ("val", 4)):
        _write_split(segdata, split, aroi_values, n, seg_rng)
    json.dump(AROI_INFO, open(segdata / "INFO.json", "w"))
    seg_out = tmp_path / "seg_out"
    run_seg_tuning.main([
        "--data_path", str(segdata), "--weights", str(weights),
        "--model_override", "miragepre_tiny", "--input_size", "64",
        "--patch_size", "8", "--batch_size", "8", "--dtype", "float32",
        "--output_dir", str(seg_out), "--num_workers", "0",
        "--epochs", "1", "--eval_freq", "1", "--max_steps_per_epoch", "2",
    ])
    seg_runs = list((seg_out / "v1" / "AROI").iterdir())
    assert len(seg_runs) == 1 and (seg_runs[0] / "checkpoint-best").is_dir()
    rows = [json.loads(l) for l in open(seg_runs[0] / "log.txt")]
    assert rows and np.isfinite(rows[-1]["train/loss"])

    # --- 5. cls tuning warm start (linear probe) ----------------------------
    _make_cls_dataset(tmp_path)
    cls_out = tmp_path / "cls_out"
    run_cls_tuning.main([
        "--data_root", str(tmp_path), "--data_set", "TinySet",
        "--weights", str(weights),
        "--model_override", "miragepre_tiny", "--input_size", "64",
        "--patch_size", "8", "--batch_size", "4", "--epochs", "1",
        "--dtype", "float32", "--num_workers", "0", "--early_start_from", "99",
        "--output_dir", str(cls_out), "--no-affine",
    ])
    run_dirs = list((cls_out / "v1" / "0" / "TinySet").iterdir())
    assert len(run_dirs) == 1
    import pandas as pd

    df = pd.read_csv(run_dirs[0] / "train_eval.csv")
    assert len(df) > 0 and np.isfinite(df["Loss"]).all()
