"""Recorded-golden example-triplet inference (VERDICT r3 missing #1).

Two tiers:
- ``test_recorded_tiny_golden`` always runs and needs NO live reference:
  tests/golden/example_triplet_tiny.npz holds the reference torch model's
  weights (f16-stored, exact) and its wrapper-convention outputs on the
  bundled triplet, recorded by scripts/gen_weights_golden.py. Our wrapper
  must reproduce them to <1e-5 — the BASELINE.json north-star assertion as
  a committed fact rather than a live comparison.
- ``test_real_weights_golden`` is the hook for the RELEASED checkpoints
  (j-morano/MIRAGE-{Base,Large}): it runs when BOTH the weights (under
  $MIRAGE_WEIGHTS_DIR, e.g. via ``python prepare_env.py --from-dir ...``)
  and the matching recorded golden
  (tests/golden/example_triplet_real_<stem>.npz, produced ONCE by running
  ``python scripts/gen_weights_golden.py --weights .../MIRAGE-Base.pth``
  wherever the weights + reference exist) are present; otherwise it skips
  with an actionable message. README.md documents the two commands.
"""

import os
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GOLDEN_DIR = Path(__file__).parent / "golden"


def _wrapper_preds(weights_path, golden):
    from mirage_tpu.api.wrapper import MIRAGEWrapper

    wrapper = MIRAGEWrapper(weights=str(weights_path))
    return wrapper({"bscan": np.asarray(golden["in_bscan"])})


def test_recorded_tiny_golden(tmp_path):
    golden = np.load(GOLDEN_DIR / "example_triplet_tiny.npz")
    sd = {k[2:]: torch.from_numpy(golden[k].astype(np.float32))
          for k in golden.files if k.startswith("w_")}
    assert sd, "no weights recorded in the golden artifact"
    args = SimpleNamespace(
        model="miragepre_tiny", num_global_tokens=1, drop_path=0.0,
        in_domains=["bscan", "slo", "bscanlayermap"],
        out_domains=["bscan", "slo", "bscanlayermap"],
        dim_tokens=192, depth=3, num_heads=4,  # test_model_parity dims
        decoder_dim=64, decoder_depth=2, decoder_num_heads=4,
        decoder_use_task_queries=True, decoder_use_xattn=True)
    weights = tmp_path / "tiny_golden.pth"
    torch.save({"model": sd, "args": args}, weights)

    preds = _wrapper_preds(weights, golden)
    for task in ("bscan", "slo", "bscanlayermap"):
        diff = np.abs(np.asarray(preds[task])
                      - golden[f"pred_{task}"]).max()
        assert diff < 1e-5, (task, float(diff))


def test_real_weights_golden():
    wdir = os.environ.get("MIRAGE_WEIGHTS_DIR")
    if not wdir:
        pytest.skip("set MIRAGE_WEIGHTS_DIR to the released-checkpoint dir "
                    "(prepare_env.py --from-dir) to run the real-weights "
                    "golden")
    candidates = sorted(Path(wdir).glob("MIRAGE-*.pth")) + \
        sorted(Path(wdir).glob("MIRAGE-*.safetensors"))
    if not candidates:
        pytest.skip(f"no MIRAGE-*.pth/safetensors under {wdir}")
    ran = 0
    for w in candidates:
        gold = GOLDEN_DIR / f"example_triplet_real_{w.stem}.npz"
        if not gold.exists():
            continue  # record it once: scripts/gen_weights_golden.py --weights
        golden = np.load(gold)
        import hashlib

        sha = hashlib.sha256(open(w, "rb").read()).hexdigest()
        assert sha == str(golden["weights_sha256"]), \
            f"{w.name} differs from the checkpoint the golden was recorded on"
        preds = _wrapper_preds(w, golden)
        for task in ("bscan", "slo", "bscanlayermap"):
            diff = np.abs(np.asarray(preds[task])
                          - golden[f"pred_{task}"]).max()
            assert diff < 1e-5, (w.name, task, float(diff))
        ran += 1
    if not ran:
        pytest.skip("weights present but no recorded real-weights golden — "
                    "run scripts/gen_weights_golden.py --weights <ckpt> "
                    "once and commit tests/golden/example_triplet_real_*.npz")
