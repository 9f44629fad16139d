"""Default-suite pretraining CLI smoke: 1 epoch on tiny synthetic data, then
auto-resume for a second epoch — exercises the run_pretraining loop,
checkpoint save, auto_load_checkpoint resume, debug-recon dumps, and the
JSONL log without RUN_SLOW (full learning validation is in
test_learning_slow.py)."""

import json
from pathlib import Path

import numpy as np


def _make_data(root: Path, rng, n=8):
    for task in ["bscan", "slo", "bscanlayermap"]:
        (root / task).mkdir(parents=True)
        for i in range(n):
            if task == "bscanlayermap":
                np.save(root / task / f"s{i}.npy",
                        rng.integers(0, 13, (96, 96)).astype(np.uint8))
            else:
                np.save(root / task / f"s{i}.npy",
                        (rng.random((96, 96)) * 255).astype(np.uint8))


def test_pretraining_cli_runs_and_resumes(tmp_path):
    from mirage_tpu.cli import run_pretraining

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    _make_data(data, rng)
    out = tmp_path / "out"
    common = [
        "--in_domains", "bscan-slo-bscanlayermap",
        "--out_domains", "bscan-slo-bscanlayermap",
        "--model", "miragepre_tiny", "--decoder_dim", "64",
        "--decoder_depth", "1", "--decoder_num_heads", "4",
        "--input_size", "64", "--patch_size", "8",
        "--num_encoded_tokens", "48",
        "--warmup_epochs", "1", "--batch_size", "8", "--lr", "1e-3",
        "--save_ckpt_freq", "1", "--num_workers", "0", "--use_cache",
        "--dtype", "float32", "--data_path", str(data),
        "--output_dir", str(out),
    ]
    run_pretraining.main(common + ["--epochs", "1"])
    assert (out / "checkpoint-0").is_dir(), "epoch checkpoint missing"
    rows = [json.loads(l) for l in open(out / "log.txt")]
    assert rows and np.isfinite(rows[-1]["train_loss"])

    # auto-resume: rerun with epochs=2 — must start from epoch 1, not 0
    run_pretraining.main(common + ["--epochs", "2"])
    assert (out / "checkpoint-1").is_dir(), "resume did not advance epochs"
    rows2 = [json.loads(l) for l in open(out / "log.txt")]
    epochs_logged = [r["epoch"] for r in rows2 if "epoch" in r]
    assert 1 in epochs_logged and epochs_logged.count(0) == 1, (
        "resume should continue at epoch 1 without re-running epoch 0: "
        f"{epochs_logged}")


def test_pretraining_cli_gspmd_mesh(tmp_path, monkeypatch):
    """The GSPMD escape hatch (MIRAGE_TP_STEP=gspmd): a combined
    fsdp x tensor mesh routes through the GSPMD jit with the fused kernels
    forced OFF (attn_impl='xla' — a pallas_call with sharded operands is a
    hard Mosaic error). The DEFAULT path for this mesh is the composed
    Megatron+ZeRO shard_map step (tests/test_tp_step.py); this pins the
    documented fallback."""
    from mirage_tpu.cli import run_pretraining
    from mirage_tpu.train import steps

    monkeypatch.setattr(steps, "_TP_STEP", "gspmd")

    rng = np.random.default_rng(1)
    data = tmp_path / "data"
    _make_data(data, rng)
    out = tmp_path / "out"
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
        "--output_dir", str(out),
        "--mesh_fsdp", "2", "--mesh_tensor", "2", "--epochs", "1",
    ])
    log = (out / "log.txt").read_text().strip().splitlines()
    assert np.isfinite(json.loads(log[-1])["train_loss"])


def test_pretraining_cli_rejects_indivisible_batch(tmp_path):
    """Uneven batch shards are a startup error, not a mid-run crash: the
    guard fires right after mesh construction (8 virtual devices here),
    before any data or model work."""
    import pytest

    from mirage_tpu.cli import run_pretraining

    with pytest.raises(SystemExit, match="divisible"):
        run_pretraining.main([
            "--in_domains", "bscan", "--out_domains", "bscan",
            "--model", "miragepre_tiny", "--batch_size", "7",
            "--data_path", str(tmp_path / "missing"),
            "--output_dir", str(tmp_path / "out"),
        ])
