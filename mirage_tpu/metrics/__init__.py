from mirage_tpu.metrics.semseg import (  # noqa: F401
    eval_metrics,
    intersect_and_union,
    mean_dice,
    mean_iou,
    total_intersect_and_union,
)
from mirage_tpu.metrics.classification import compute_cls_metrics  # noqa: F401
from mirage_tpu.metrics.volume import (  # noqa: F401
    dice_score,
    iou_score,
    volume_hausdorff_distance,
)
