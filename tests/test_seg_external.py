"""Cross-dataset external segmentation transfer, end-to-end:
train tiny on synthetic AROI -> test on synthetic Duke_iAMD
(preds_Duke_iAMD export, run_seg_tuning.py:428-439) -> run_seg_eval
--external Duke_iAMD (AROI->Duke-iAMD translator, run_seg_eval.py:109-148)
-> results CSVs. Also drives the in-domain AROI eval (layers/lesions CSVs)."""

import json
from pathlib import Path

import numpy as np
import pytest


AROI_INFO = {
    "0": {"label": "Above ILM", "value": 0},
    "1": {"label": "ILM-IPL/INL", "value": 23},
    "2": {"label": "IPL/INL-RPE", "value": 46},
    "3": {"label": "RPE-BM", "value": 69},
    "4": {"label": "Under BM", "value": 92},
    "5": {"label": "Cyst", "value": 115},
    "6": {"label": "PED", "value": 138},
    "7": {"label": "SRF", "value": 161},
}
DUKE_INFO = {
    "0": {"label": "Invalid", "value": 0},
    "1": {"label": "Above ILM", "value": 51},
    "2": {"label": "ILM-Inner RPEDC", "value": 102},
    "3": {"label": "Inner RPEDC-Outer BM", "value": 153},
    "4": {"label": "Below BM", "value": 204},
}


def _write_split(root: Path, split: str, values, n, rng, size=64):
    from PIL import Image

    for task in ("bscan", "semseg"):
        (root / split / task).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = (rng.random((size, size)) * 255).astype(np.uint8)
        seg = np.full((size, size), values[0], np.uint8)
        bands = np.array_split(np.arange(size), len(values))
        for band, v in zip(bands, values):
            seg[band[0]:band[-1] + 1] = v
        # volume-style {scan}_{slice} stems for run_seg_eval grouping
        stem = f"scan{i // 2}_{i % 2}"
        Image.fromarray(img).save(root / split / "bscan" / f"{stem}.png")
        Image.fromarray(seg).save(root / split / "semseg" / f"{stem}.png")


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    base = tmp_path_factory.mktemp("segdata")
    rng = np.random.default_rng(0)
    aroi = base / "AROI"
    aroi_values = [v["value"] for v in AROI_INFO.values()]
    for split, n in (("train", 8), ("val", 4), ("test", 4)):
        _write_split(aroi, split, aroi_values, n, rng)
    json.dump(AROI_INFO, open(aroi / "INFO.json", "w"))

    duke = base / "Duke_iAMD"
    duke_values = [v["value"] for v in DUKE_INFO.values()]
    _write_split(duke, "test", duke_values, 4, rng)
    json.dump(DUKE_INFO, open(duke / "INFO.json", "w"))
    return base


def _make_weights(tmp_path):
    import jax

    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.checkpoint import save_safetensors

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(8, 8),
                                        image_size=64)}
    core = MIRAGEModel(input_adapters=ins, output_adapters=None,
                       dim_tokens=192, depth=3, num_heads=4)
    params = core.init_params(jax.random.PRNGKey(0))
    weights = tmp_path / "mirage-base_tiny.safetensors"
    save_safetensors(params, core, str(weights))
    return weights


def test_external_transfer_end_to_end(datasets, tmp_path):
    from mirage_tpu.cli import run_seg_eval, run_seg_tuning

    weights = _make_weights(tmp_path)
    out = tmp_path / "out"
    common = [
        "--data_path", str(datasets / "AROI"), "--weights", str(weights),
        "--model_override", "miragepre_tiny", "--input_size", "64",
        "--patch_size", "8", "--batch_size", "8", "--dtype", "float32",
        "--output_dir", str(out), "--num_workers", "0",
    ]
    # 1 epoch of training
    run_seg_tuning.main(common + ["--epochs", "1", "--eval_freq", "1",
                                  "--max_steps_per_epoch", "2"])
    model_dir = out / "v1" / "AROI" / "mirage-base_tiny_frozen_convnext_CEGDice_minmax"
    assert (model_dir / "checkpoint-best").is_dir()

    # in-domain test on AROI/test -> preds/
    run_seg_tuning.main(common + ["--test"])
    preds = list((model_dir / "preds").glob("*.png"))
    assert len(preds) == 4, preds

    # external test: Duke_iAMD path -> auto-detected, exports preds_Duke_iAMD
    run_seg_tuning.main(common + [
        "--test", "--test_data_path", str(datasets / "Duke_iAMD" / "test")])
    ext_preds = list((model_dir / "preds_Duke_iAMD").glob("*.png"))
    assert len(ext_preds) == 4, ext_preds

    # offline eval, in-domain: AROI layers/lesions CSV split
    run_seg_eval.main(["-d", str(datasets), "-m", str(model_dir)])
    assert (model_dir / "results_layers.csv").is_file()
    assert (model_dir / "results_lesions.csv").is_file()

    # offline eval, external: AROI->Duke-iAMD translator + suffixed CSV
    df = run_seg_eval.main(["-d", str(datasets), "-m", str(model_dir),
                            "-e", "Duke_iAMD"])
    assert (model_dir / "results_Duke_iAMD.csv").is_file()
    # translator output stays within Duke's class values
    assert set(df["Class"]) <= {v["label"] for v in DUKE_INFO.values()}
    assert len(df) > 0
