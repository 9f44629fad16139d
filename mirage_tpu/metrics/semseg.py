"""Histogram-based semantic-segmentation metrics (mIoU / mDice / accuracy).

Capability parity: mutils/semseg_metrics.py (mmseg-style two-pass histogram
accumulation with ignore_index masking, optional label_map remap and
reduce_zero_label). Implementation is bincount-based numpy (equivalent to the
reference's np.histogram over integer bins, but O(n) and allocation-light);
an accumulator class is provided so evaluation loops can stream batches
instead of keeping every prediction in host RAM (the reference accumulates
full lists, run_seg_tuning.py:1056-1059 — unnecessary at TPU batch sizes).
"""

from typing import Dict, Optional, Sequence

import numpy as np


def _prepare(label, label_map, reduce_zero_label):
    label = np.asarray(label)
    if label_map:
        out = label.copy()
        for old_id, new_id in label_map.items():
            out[label == old_id] = new_id
        label = out
    if reduce_zero_label:
        label = label.astype(np.int64)
        label = np.where(label == 0, 255, label - 1)
        label = np.where(label == 254, 255, label)
    return label


def intersect_and_union(pred_label, label, num_classes, ignore_index,
                        label_map: Optional[Dict[int, int]] = None,
                        reduce_zero_label: bool = False):
    """Per-image class histograms: (intersect, union, pred_area, label_area)."""
    pred_label = np.asarray(pred_label)
    label = _prepare(label, label_map or {}, reduce_zero_label)

    mask = label != ignore_index
    pred_label = pred_label[mask].astype(np.int64)
    label = label[mask].astype(np.int64)

    area_pred = np.bincount(pred_label, minlength=num_classes)[:num_classes]
    area_label = np.bincount(label, minlength=num_classes)[:num_classes]
    correct = pred_label[pred_label == label]
    area_intersect = np.bincount(correct, minlength=num_classes)[:num_classes]
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label


class SegMetricAccumulator:
    """Streaming accumulator over batches of (pred, gt) label maps."""

    def __init__(self, num_classes: int, ignore_index: int,
                 label_map: Optional[Dict[int, int]] = None,
                 reduce_zero_label: bool = False):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.label_map = label_map
        self.reduce_zero_label = reduce_zero_label
        self.intersect = np.zeros(num_classes, dtype=np.float64)
        self.union = np.zeros(num_classes, dtype=np.float64)
        self.pred = np.zeros(num_classes, dtype=np.float64)
        self.label = np.zeros(num_classes, dtype=np.float64)

    def update(self, pred_label, label):
        i, u, p, l = intersect_and_union(
            pred_label, label, self.num_classes, self.ignore_index,
            self.label_map, self.reduce_zero_label)
        self.intersect += i
        self.union += u
        self.pred += p
        self.label += l

    def compute(self, metrics: Sequence[str] = ("mIoU",), nan_to_num=None):
        with np.errstate(divide="ignore", invalid="ignore"):
            all_acc = self.intersect.sum() / self.label.sum()
            acc = self.intersect / self.label
            ret = [all_acc, acc]
            for metric in metrics:
                if metric == "mIoU":
                    ret.append(self.intersect / self.union)
                elif metric == "mDice":
                    ret.append(2 * self.intersect / (self.pred + self.label))
                else:
                    raise KeyError(f"metric {metric} is not supported")
        if nan_to_num is not None:
            ret = [np.nan_to_num(m, nan=nan_to_num) for m in ret]
        return ret


def total_intersect_and_union(results, gt_seg_maps, num_classes, ignore_index,
                              label_map=None, reduce_zero_label=False):
    acc = SegMetricAccumulator(num_classes, ignore_index, label_map,
                               reduce_zero_label)
    assert len(results) == len(gt_seg_maps)
    for pred, gt in zip(results, gt_seg_maps):
        acc.update(pred, gt)
    return acc.intersect, acc.union, acc.pred, acc.label


def eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                 metrics=("mIoU",), nan_to_num=None, label_map=None,
                 reduce_zero_label=False):
    if isinstance(metrics, str):
        metrics = [metrics]
    acc = SegMetricAccumulator(num_classes, ignore_index, label_map,
                               reduce_zero_label)
    for pred, gt in zip(results, gt_seg_maps):
        acc.update(pred, gt)
    return acc.compute(metrics, nan_to_num)


def mean_iou(results, gt_seg_maps, num_classes, ignore_index, nan_to_num=None,
             label_map=None, reduce_zero_label=False):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ["mIoU"], nan_to_num, label_map, reduce_zero_label)


def mean_dice(results, gt_seg_maps, num_classes, ignore_index, nan_to_num=None,
              label_map=None, reduce_zero_label=False):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ["mDice"], nan_to_num, label_map, reduce_zero_label)
