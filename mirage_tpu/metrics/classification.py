"""Classification metrics: BAcc / AUROC / AP / F1 / MCC.

Parity: mutils/classification.py:248-266 — the exact sklearn calls the
reference makes (AUROC one-vs-rest weighted, AP weighted, F1 weighted with
zero_division=0, balanced accuracy, Matthews corrcoef).
"""

from collections import OrderedDict
from typing import Optional

import numpy as np


def compute_cls_metrics(y_true, probs, *, loss: Optional[float] = None,
                        epoch=None):
    """y_true: (N,) int labels; probs: (N, C) softmax scores.
    Returns an OrderedDict matching the reference's CSV row schema."""
    from sklearn.metrics import (
        average_precision_score,
        balanced_accuracy_score,
        f1_score,
        matthews_corrcoef,
        roc_auc_score,
    )

    y_true = np.asarray(y_true)
    probs = np.asarray(probs)
    num_classes = probs.shape[1]
    y_pred = probs.argmax(axis=1)
    onehot = np.eye(num_classes)[y_true]

    bacc = balanced_accuracy_score(y_true, y_pred)
    auroc = roc_auc_score(onehot, probs, multi_class="ovr", average="weighted")
    ap = average_precision_score(onehot, probs, average="weighted")
    f1 = f1_score(y_true, y_pred, average="weighted", zero_division=0.0)
    mcc = matthews_corrcoef(y_true, y_pred)

    return OrderedDict({
        "epoch": epoch,
        "loss": loss,
        "bacc": bacc,
        "auroc": auroc,
        "ap": ap,
        "f1": f1,
        "mcc": mcc,
    })
