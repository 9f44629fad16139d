"""Tests: checkpointing round-trip/auto-resume, logger, early stopping,
checkpoint surgery (pos-emb interpolation parity vs torch)."""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference


def small_state():
    return {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                   "b": jnp.ones((3,))},
        "opt": {"mu": {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))},
                "count": jnp.zeros((), jnp.int32)},
        "step": jnp.asarray(7, jnp.int32),
    }


def test_checkpoint_roundtrip(tmp_path):
    from mirage_tpu.train import checkpoint as ckpt

    state = small_state()
    out = str(tmp_path)
    ckpt.save_checkpoint(out, state, epoch=3, args={"lr": 1e-4, "model": "base"})
    restored, start = ckpt.auto_load_checkpoint(out, jax.tree_util.tree_map(
        jnp.zeros_like, state))
    assert start == 4
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


def test_checkpoint_latest_and_best(tmp_path):
    from mirage_tpu.train import checkpoint as ckpt

    state = small_state()
    out = str(tmp_path)
    ckpt.save_checkpoint(out, state, epoch=1)
    state2 = jax.tree_util.tree_map(lambda x: x + 1, state)
    ckpt.save_checkpoint(out, state2, epoch=5)
    ckpt.save_checkpoint(out, state, epoch=5, tag="best")
    assert ckpt.latest_checkpoint(out).endswith("checkpoint-5")
    best = ckpt.load_best_checkpoint(out, jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(best["params"]["b"]), np.ones(3))
    restored, start = ckpt.auto_load_checkpoint(out, jax.tree_util.tree_map(
        jnp.zeros_like, state))
    assert start == 6
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]),
                                  np.asarray(state2["params"]["b"]))


def test_auto_load_empty(tmp_path):
    from mirage_tpu.train import checkpoint as ckpt

    state = small_state()
    restored, start = ckpt.auto_load_checkpoint(str(tmp_path), state)
    assert start == 0 and restored is state


def test_metric_logger():
    from mirage_tpu.train.logger import MetricLogger, SmoothedValue

    lines = []
    log = MetricLogger(print_fn=lines.append)
    for batch in log.log_every(range(10), print_freq=3, header="ep0"):
        log.update(loss=float(batch), lr=1e-4)
    assert any("loss" in l for l in lines)
    assert log.meters["loss"].count == 10
    sv = SmoothedValue(window_size=2)
    sv.update(1.0)
    sv.update(3.0)
    assert sv.avg == 2.0 and sv.global_avg == 2.0 and sv.max == 3.0


def test_append_log(tmp_path):
    import json

    from mirage_tpu.train.logger import append_log

    append_log(str(tmp_path), {"epoch": 0, "loss": 1.0})
    append_log(str(tmp_path), {"epoch": 1, "loss": 0.5})
    with open(os.path.join(str(tmp_path), "log.txt")) as f:
        rows = [json.loads(l) for l in f]
    assert rows[1]["epoch"] == 1


@requires_reference
def test_early_stopping_matches_reference(reference_path):
    from mutils.classification import EarlyStopping as RefES
    from mirage_tpu.train.early_stop import EarlyStopping

    seq = [(0.5, 1.0), (0.6, 0.9), (0.6, 0.7), (0.55, 0.8), (0.61, 0.6),
           (0.61, 0.59), (0.60, 0.5), (0.60, 0.4), (0.59, 0.3)]
    ref = RefES(patience=3, greater_is_better=True, start_from=0)
    ours = EarlyStopping(patience=3, greater_is_better=True, start_from=0)
    for epoch, (v1, v2) in enumerate(seq):
        assert ref(v1, v2, epoch) == ours(v1, v2, epoch), epoch
        assert ref.early_stop == ours.early_stop, epoch


@requires_reference
def test_interpolate_pos_embed_parity(reference_path, rng):
    torch = pytest.importorskip("torch")
    from mirage_tpu.adapters.input_adapters import PatchedInputAdapter
    from mirage_tpu.api.convert import interpolate_pos_embed_sd
    from mirage_tpu.models.mirage import MIRAGEModel

    # 512-pretrain grid (16x16) -> 1024-finetune grid (32x32)
    pos = rng.standard_normal((1, 64, 16, 16)).astype(np.float32)
    sd = {"input_adapters.bscan.pos_emb": pos}
    model = MIRAGEModel(input_adapters={
        "bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                     image_size=1024)},
        dim_tokens=64, depth=1, num_heads=4)
    out = interpolate_pos_embed_sd(sd, model)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(pos), size=(32, 32), mode="bicubic",
        align_corners=False).numpy()
    np.testing.assert_allclose(out["input_adapters.bscan.pos_emb"], want,
                               atol=1e-5, rtol=1e-5)


def test_seg_checkpoint_surgery():
    from mirage_tpu.api.convert import seg_checkpoint_surgery

    sd = {
        "input_adapters.bscanlayermap.class_emb.weight": np.ones((13, 64), np.float32),
        "input_adapters.bscanlayermap.pos_emb": np.zeros((1, 4, 2, 2)),
        "output_adapters.bscan.mask_token": np.zeros((1, 1, 4)),
        "encoder.0.norm1.weight": np.ones(4),
    }
    out = seg_checkpoint_surgery(sd)
    assert "output_adapters.bscan.mask_token" not in out
    assert "input_adapters.semseg.pos_emb" in out
    emb = out["input_adapters.semseg.class_emb.weight"]
    assert emb.shape == (14, 64)
    np.testing.assert_array_equal(emb[-1], 0)


def test_apply_compile_cache(monkeypatch, tmp_path):
    """MIRAGE_COMPILE_CACHE routing: explicit dir sets the jax config, off/cpu
    leave it untouched (cli/config.apply_compile_cache)."""
    from mirage_tpu.cli.config import apply_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # off: no change
        monkeypatch.setenv("MIRAGE_COMPILE_CACHE", "off")
        apply_compile_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        # unset + cpu-pinned platform (the test suite's state): default stays off
        monkeypatch.delenv("MIRAGE_COMPILE_CACHE", raising=False)
        assert (jax.config.jax_platforms or "").split(",")[0] == "cpu"
        apply_compile_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        # explicit dir wins regardless of platform
        cache_dir = str(tmp_path / "xla_cache")
        monkeypatch.setenv("MIRAGE_COMPILE_CACHE", cache_dir)
        apply_compile_cache()
        assert jax.config.jax_compilation_cache_dir == cache_dir
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
