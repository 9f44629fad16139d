from mirage_tpu.data.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, IMG_EXTENSIONS  # noqa: F401
from mirage_tpu.data.folder import (  # noqa: F401
    ImageFolder,
    MultiTaskImageFolder,
    MultiTaskPretDatasetFolder,
    make_class_dataset,
    make_nonclass_dataset,
    normalize_to_0_1,
)
from mirage_tpu.data.loader import DataLoader  # noqa: F401
from mirage_tpu.data.augment import (  # noqa: F401
    PretrainAugment,
    SemSegTransform,
    affine_warp,
    random_affine_params,
    resize_np,
)
