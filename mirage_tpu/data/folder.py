"""Filesystem datasets: parallel per-task folders and class folders.

Capability parity: mutils/dataset_folder.py (make_nonclass_dataset sorted
recursive walk :32-51, MultiTaskDatasetFolder with semseg value->index
mapping + normalize_to_0_1 + seeded max_images subsample :59-174,
MultiTaskImageFolder :177-198) and mutils/datasets_pretrain.py
(MultiTaskPretDatasetFolder npy loaders + RAM cache :86-207); plus a
torchvision-style ImageFolder for the classification path.

Datasets return numpy; transforms receive an explicit np.random.Generator
(derived per-sample from the loader's epoch seed) instead of global RNG.
"""

import os
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mirage_tpu.data.constants import IMG_EXTENSIONS


def read_image(path: str) -> np.ndarray:
    """Load an image file to numpy (PIL for images, np.load for npy/npz)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        data = np.load(path)
        return data[list(data.keys())[0]]
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def normalize_to_0_1(sample: np.ndarray) -> np.ndarray:
    sample = sample.astype(np.float32)
    lo, hi = np.min(sample), np.max(sample)
    return (sample - lo) / max(hi - lo, 1e-12)


def make_nonclass_dataset(directory: str,
                          extensions: Optional[Tuple[str, ...]] = None
                          ) -> List[str]:
    """Sorted recursive walk collecting files with allowed extensions."""
    extensions = extensions or IMG_EXTENSIONS
    directory = os.path.expanduser(directory)
    assert os.path.isdir(directory), directory
    out = []
    for root, _, fnames in sorted(os.walk(directory, followlinks=True)):
        for fname in sorted(fnames):
            if fname.lower().endswith(extensions):
                out.append(os.path.join(root, fname))
    return out


def make_class_dataset(directory: str,
                       extensions: Optional[Tuple[str, ...]] = None):
    """(paths, targets, classes): torchvision ImageFolder layout —
    directory/class_x/xxx.png."""
    extensions = extensions or IMG_EXTENSIONS
    classes = sorted(d.name for d in os.scandir(directory) if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    paths, targets = [], []
    for c in classes:
        for p in make_nonclass_dataset(os.path.join(directory, c), extensions):
            paths.append(p)
            targets.append(class_to_idx[c])
    return paths, np.asarray(targets, np.int64), classes


class MultiTaskDatasetFolder:
    """Parallel per-task folders with matching filenames:
    root/task_a/..../xxx.png, root/task_b/..../xxx.png.

    transform(sample_dict, rng) -> sample_dict. 'semseg' tasks get the
    value->index ``mapping`` applied; other tasks are min-max normalized.
    Returns (sample_dict, target, id).
    """

    def __init__(self, root: str, tasks: Sequence[str], *,
                 mapping: Optional[Dict[int, int]] = None,
                 extensions: Optional[Tuple[str, ...]] = None,
                 transform: Optional[Callable] = None,
                 prefixes: Optional[Dict[str, str]] = None,
                 max_images: Optional[int] = None):
        self.root = root
        self.tasks = list(tasks)
        self.mapping = mapping
        self.transform = transform
        prefixes = dict(prefixes or {})
        for task in self.tasks:
            prefixes.setdefault(task, "")
        self.samples = {
            task: make_nonclass_dataset(
                os.path.join(root, f"{prefixes[task]}{task}"), extensions)
            for task in self.tasks
        }
        for task, files in self.samples.items():
            if not files:
                raise RuntimeError(f"Found 0 files under {os.path.join(root, task)}")
        if isinstance(max_images, int):
            total = len(self.samples[self.tasks[0]])
            perm = np.random.default_rng(0).permutation(total)
            for task in self.tasks:
                self.samples[task] = [self.samples[task][i]
                                      for i in perm][:max_images]

    def _apply_mapping(self, sample: np.ndarray) -> np.ndarray:
        lut_size = int(max(self.mapping.keys())) + 1
        lut = np.zeros(lut_size, np.int64)
        for k, v in self.mapping.items():
            lut[k] = v
        return lut[np.clip(sample.astype(np.int64), 0, lut_size - 1)]

    def load_raw(self, index: int):
        sample_dict = {}
        sid = None
        for task in self.tasks:
            path = self.samples[task][index]
            sample = read_image(path)
            if "semseg" in task:
                if self.mapping is not None:
                    sample = self._apply_mapping(sample)
            else:
                sample = normalize_to_0_1(sample)
            sample_dict[task] = sample
            if sid is None:
                sid = Path(path).stem
        return sample_dict, sid

    def __getitem__(self, item):
        index, rng = item if isinstance(item, tuple) else (item, np.random.default_rng(0))
        sample_dict, sid = self.load_raw(index)
        if self.transform is not None:
            sample_dict = self.transform(sample_dict, rng)
        return sample_dict, None, sid

    def __len__(self):
        return len(self.samples[self.tasks[0]])


class MultiTaskImageFolder(MultiTaskDatasetFolder):
    def __init__(self, root, tasks, **kwargs):
        kwargs.setdefault("extensions", IMG_EXTENSIONS)
        super().__init__(root, tasks, **kwargs)


class MultiTaskPretDatasetFolder(MultiTaskDatasetFolder):
    """Pretraining variant: npy loaders per modality (layermaps -> int label
    stacks, images -> float/255) with optional in-RAM cache
    (datasets_pretrain.py:86-207)."""

    def __init__(self, root, tasks, *, transform=None, use_cache=False,
                 extensions=None):
        super().__init__(root, tasks, transform=transform, extensions=extensions)
        self.use_cache = use_cache
        self.cache: Dict[int, dict] = {}

    def load_raw(self, index: int):
        if self.use_cache and index in self.cache:
            sample_dict, sid = self.cache[index]
            return {k: v.copy() for k, v in sample_dict.items()}, sid
        sample_dict = {}
        sid = None
        for task in self.tasks:
            path = self.samples[task][index]
            if path.endswith((".npy", ".npz")):
                if task == "layermaps":
                    sample = np.load(path)["layer_maps"].astype(np.int64)
                elif task in ("bscanlayermap", "semseg"):
                    sample = np.load(path).astype(np.int64)
                else:
                    sample = np.load(path).astype(np.float32) / 255.0
            else:
                sample = read_image(path).astype(np.float32) / 255.0
            sample_dict[task] = sample
            if sid is None:
                sid = Path(path).stem
        if self.use_cache:
            self.cache[index] = ({k: v.copy() for k, v in sample_dict.items()}, sid)
        return sample_dict, sid


class ImageFolder:
    """Classification dataset: root/class_x/xxx.png -> (image, target, id).
    transform(img, rng) -> (C, H, W) float32."""

    def __init__(self, root: str, transform: Optional[Callable] = None,
                 extensions: Optional[Tuple[str, ...]] = None):
        self.paths, self.targets, self.classes = make_class_dataset(root, extensions)
        if not self.paths:
            raise RuntimeError(f"Found 0 files under {root}")
        self.transform = transform

    @property
    def num_classes(self):
        return len(self.classes)

    def __getitem__(self, item):
        index, rng = item if isinstance(item, tuple) else (item, np.random.default_rng(0))
        img = read_image(self.paths[index])
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, int(self.targets[index]), Path(self.paths[index]).stem

    def __len__(self):
        return len(self.paths)
