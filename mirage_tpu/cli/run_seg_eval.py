"""Offline volume-level segmentation evaluation.

Parity: run_seg_eval.py — groups exported prediction PNGs into volumes by
``{scan_id}_{slice}`` filename stems, computes per-class volume Dice / IoU /
HD95 (95th-percentile Hausdorff, empty-set NaN policy), handles bg/invalid
classes from INFO.json, the AROI -> Duke-iAMD cross-dataset class translator,
and the layers-vs-lesions split CSVs for Duke_DME / AROI.

Runs entirely on host numpy (it is an offline post-processing step).
"""

import argparse
import json
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("Evaluate segmentation results")
    p.add_argument("-d", "--datasets_path", type=str,
                   default="./__datasets/Segmentation/")
    p.add_argument("-m", "--model_path", type=str, required=True,
                   help='Trained model dir containing a "preds" subdirectory')
    p.add_argument("-e", "--external", type=str, default=None)
    p.add_argument("--ignore_bg", action="store_true", default=True)
    p.add_argument("--no_ignore_bg", dest="ignore_bg", action="store_false")
    p.add_argument("--empty_sets_nan", action="store_true", default=True)
    p.add_argument("--no_empty_sets_nan", dest="empty_sets_nan",
                   action="store_false")
    return p.parse_args(argv)


AROI_TO_DUKEIAMD = {0: 51, 23: 102, 46: 102, 69: 153, 92: 204,
                    115: 0, 138: 0, 161: 0}


def translate_to_dukeiamd_from_aroi(y_pred, y_true):
    """AROI layer classes -> Duke iAMD classes; lesion classes map to the
    invalid class, and matching GT pixels are invalidated too
    (run_seg_eval.py:109-148)."""
    lut = np.zeros(max(AROI_TO_DUKEIAMD) + 1, y_pred.dtype)
    for k, v in AROI_TO_DUKEIAMD.items():
        lut[k] = v
    y_pred_t = lut[np.clip(y_pred, 0, len(lut) - 1)]
    y_true_t = y_true.copy()
    y_true_t[y_pred_t == 0] = 0
    return y_pred_t, y_true_t


def group_volumes(gt_dir: Path):
    """{scan_id: [ordered slice stems]} by '{scan}_{slice}' naming."""
    volumes = {}
    for fn in gt_dir.iterdir():
        stem = fn.stem
        cut = stem.rfind("_")
        scan_id = stem[:cut]
        slice_num = int(stem[cut + 1:])
        volumes.setdefault(scan_id, {})[slice_num] = stem
    return {sid: [sl[i] for i in sorted(sl)] for sid, sl in volumes.items()}


def read_png(path: Path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def main(argv=None):
    import pandas as pd

    from mirage_tpu.data.augment import resize_np
    from mirage_tpu.metrics.volume import (dice_score, iou_score,
                                           volume_hausdorff_distance)

    args = get_args(argv)
    model_path = Path(args.model_path)
    datasets_path = Path(args.datasets_path)
    if args.external is not None:
        preds_path = model_path / f"preds_{args.external}"
        dataset = args.external
        suffix = f"_{args.external}"
        test_dir = datasets_path / dataset / "test"
        gt_dir = (test_dir / "semseg") if test_dir.exists() \
            else (datasets_path / dataset / "semseg")
        source_dataset = model_path.parent.name
    else:
        preds_path = model_path / "preds"
        dataset = model_path.parent.name
        suffix = ""
        gt_dir = datasets_path / dataset / "test" / "semseg"
        source_dataset = dataset

    translator = (translate_to_dukeiamd_from_aroi
                  if dataset.startswith("Duke_iAMD") and source_dataset == "AROI"
                  else (lambda p, g: (p, g)))

    assert preds_path.exists(), preds_path
    assert gt_dir.exists(), gt_dir

    with open(datasets_path / dataset / "INFO.json") as f:
        info = json.load(f)
    sem_classes = {v["value"]: v["label"] for v in info.values()}

    fg_classes, invalid_classes = [], []
    for value, label in sem_classes.items():
        low = label.lower()
        if "invalid" in low:
            invalid_classes.append(value)
        elif not (args.ignore_bg and ("bg" in low or "background" in low
                                      or "above ilm" in low)):
            fg_classes.append(value)
    print("Foreground classes:", fg_classes)

    rows = []
    for scan_id, slices in group_volumes(gt_dir).items():
        gt = np.stack([read_png(gt_dir / f"{s}.png") for s in slices])
        preds = []
        for s in slices:
            for cand in (f"{s}.png", f"{s}_pred.png"):
                if (preds_path / cand).exists():
                    preds.append(read_png(preds_path / cand))
                    break
            else:
                raise FileNotFoundError(f"No prediction for slice {s}")
        pred = np.stack(preds)
        if gt.shape != pred.shape:
            pred = np.stack([resize_np(p, gt.shape[1:], mode="nearest")
                             for p in pred])
        pred, gt = translator(pred, gt)
        for sc in invalid_classes:
            pred[gt == sc] = sc
        for sc in fg_classes:
            sc_gt = gt == sc
            sc_pred = pred == sc
            rows.append({
                "ID": scan_id,
                "Class": sem_classes[sc],
                "Dice": dice_score(sc_pred, sc_gt),
                "IoU": iou_score(sc_pred, sc_gt),
                "HD95": volume_hausdorff_distance(sc_pred, sc_gt, 95,
                                                  args.empty_sets_nan),
            })
    results_df = pd.DataFrame(rows)

    def show(df, tag=""):
        print(f"  {tag}Dice: {df['Dice'].mean() * 100:.2f}  "
              f"IoU: {df['IoU'].mean() * 100:.2f}  HD95: {df['HD95'].mean():.2f}")

    print("\nAverage results:")
    show(results_df)

    if dataset in ("Duke_DME", "AROI"):
        lesions = ["Fluid", "Cyst", "PED", "SRF"]
        layers_df = results_df[~results_df["Class"].isin(lesions)]
        lesions_df = results_df[results_df["Class"].isin(lesions)]
        print("Layers:")
        show(layers_df)
        print("Lesions:")
        show(lesions_df)
        layers_df.to_csv(model_path / f"results_layers{suffix}.csv", index=False)
        lesions_df.to_csv(model_path / f"results_lesions{suffix}.csv", index=False)
    else:
        results_df.to_csv(model_path / f"results{suffix}.csv", index=False)
    print(f'Results saved to "{model_path}"')
    return results_df


if __name__ == "__main__":
    main()
