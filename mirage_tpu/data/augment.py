"""Host-side augmentation / preprocessing (numpy + scipy).

Capability parity:
  - DataAugmentationForMIRAGE (mutils/datasets_pretrain.py:18-84): shared
    flip decision across modalities, shared affine params but SLO restricted
    to x-translation only (enface vs cross-section geometry), gaussian
    intensity shift (images only), per-modality nearest/bilinear resize.
  - simple_transform / DataAugmentationForSemSeg (mutils/datasets_semseg.py):
    train = HFlip + resize 1.1x + shared random crop; norm modes
    minmax/imagenet/sam/z-score; image -> float32 CHW, mask -> int64 HW.
  - torchvision RandomAffine semantics (degrees/translate/scale/shear with
    bilinear resampling and constant fill), rebuilt on scipy's
    affine_transform with the standard inverse-matrix parameterization.

Resizes reuse the exact-torch interpolation matrices from nn/resize (host
numpy einsum — identical numerics to the on-device path).

All randomness flows through an explicit ``np.random.Generator`` so host-side
augmentation is reproducible and per-worker streams never collide (replacing
the reference's global `random`/`np.random` state).
"""

import math
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from mirage_tpu.data.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
from mirage_tpu.nn.resize import _resize_matrix


# ---------------------------------------------------------------------------
# Exact-torch resize on host numpy
# ---------------------------------------------------------------------------

def resize_np(img: np.ndarray, out_size: Tuple[int, int], mode: str = "bilinear",
              align_corners: bool = False) -> np.ndarray:
    """Resize trailing two dims with torch F.interpolate semantics.

    Hot paths (bilinear f32, nearest int) go through the native C++ library
    (native/fastops.cpp) when built; the numpy matrix path is the exact
    reference and the fallback."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    out_h, out_w = out_size
    if (in_h, in_w) == (out_h, out_w):
        return img
    from mirage_tpu.utils import native as _native

    if mode == "bilinear" and img.dtype == np.float32:
        out = _native.resize_bilinear(img, out_size, align_corners)
        if out is not None:
            return out
    elif mode == "nearest" and np.issubdtype(img.dtype, np.integer):
        out = _native.resize_nearest(img, out_size)
        if out is not None:
            return out
    wh = _resize_matrix(in_h, out_h, mode, align_corners)
    ww = _resize_matrix(in_w, out_w, mode, align_corners)
    dtype = img.dtype
    x = img.astype(np.float32)
    x = np.einsum("oh,...hw->...ow", wh, x)
    x = np.einsum("pw,...hw->...hp", ww, x)
    if np.issubdtype(dtype, np.integer):
        return np.round(x).astype(dtype)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# Affine warps (torchvision RandomAffine equivalents)
# ---------------------------------------------------------------------------

def random_affine_params(rng: np.random.Generator, *, degrees: float = 10.0,
                         translate: Tuple[float, float] = (0.1, 0.1),
                         scale: Tuple[float, float] = (0.9, 1.1),
                         shear: float = 5.0, img_size: Tuple[int, int] = (512, 512)):
    """Sample (angle, (tx, ty), scale, (shear_x, shear_y)) — the parameter
    tuple torchvision's RandomAffine.get_params produces."""
    h, w = img_size
    angle = float(rng.uniform(-degrees, degrees))
    tx = float(np.round(rng.uniform(-translate[0] * w, translate[0] * w)))
    ty = float(np.round(rng.uniform(-translate[1] * h, translate[1] * h)))
    s = float(rng.uniform(scale[0], scale[1]))
    sh = float(rng.uniform(-shear, shear))
    return angle, (tx, ty), s, (sh, 0.0)


def _inverse_affine_matrix(center, angle, translate, scale, shear):
    """Inverse of T(center)T(translate)R(angle)Shear(sx,sy)Scale(s)T(-center):
    maps output pixel coords -> input pixel coords (x, y order)."""
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    # RSS = R(rot) @ Shear @ diag(scale): standard closed form
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    # inverse of [scale*a scale*b; scale*c scale*d] is 1/scale * [d -b; -c a]
    m = [d / scale, -b / scale, 0.0, -c / scale, a / scale, 0.0]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    # snap float-noise terms (cos(pi/2) ~ 6e-17): scipy's constant-mode
    # resampler treats a -1e-15 coordinate as fully outside (no edge blend),
    # which would zero whole rows on exact 90-degree rotations
    return [0.0 if abs(v) < 1e-9 else v for v in m]


def skimage_resize(img: np.ndarray, out_shape, order: int = 1,
                   anti_aliasing: Optional[bool] = None) -> np.ndarray:
    """Exact ``skimage.transform.resize(..., preserve_range=True)`` semantics
    (the reference CLI's preprocessing, mirage_wrapper.py:255-261).

    skimage delegates to scipy internally: an optional gaussian pre-filter
    with sigma = max(0, (downscale_factor - 1) / 2) per axis (ndi mode
    'mirror' == skimage 'reflect'), then ``ndi.zoom(..., grid_mode=True,
    mode='mirror')`` — so this scipy-based replica reproduces it exactly.
    Note these differ from the torch-semantics resizes in nn/resize:
    anti-aliased downscales and round-based (not floor) nearest sampling.
    """
    from scipy import ndimage as ndi

    img = np.asarray(img, np.float64)
    out_shape = tuple(int(s) for s in out_shape)
    factors = np.asarray(img.shape, np.float64) / np.asarray(out_shape, np.float64)
    if anti_aliasing is None:
        anti_aliasing = order != 0 and bool(np.any(factors > 1))
    if anti_aliasing:
        sigma = np.maximum(0.0, (factors - 1) / 2)
        img = ndi.gaussian_filter(img, sigma, mode="mirror")
    out = ndi.zoom(img, 1.0 / factors, order=order, mode="mirror",
                   grid_mode=True)
    assert out.shape == out_shape, (out.shape, out_shape)
    return out


def affine_warp(img: np.ndarray, angle: float, translate, scale: float, shear,
                *, order: int = 1, fill: float = 0.0) -> np.ndarray:
    """Affine-warp the trailing (H, W) dims (torchvision TF.affine semantics:
    rotation about the image center, then translate; bilinear order=1 or
    nearest order=0; constant fill)."""
    from scipy.ndimage import affine_transform

    if not isinstance(shear, (tuple, list)):
        shear = (float(shear), 0.0)
    h, w = img.shape[-2], img.shape[-1]
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    m = _inverse_affine_matrix(center, angle, translate, scale, shear)
    # scipy works in (row, col) = (y, x) order
    matrix = np.array([[m[4], m[3]], [m[1], m[0]]], np.float64)
    offset = np.array([m[5], m[2]], np.float64)

    from mirage_tpu.utils import native as _native

    out = _native.affine_warp(img, matrix, offset, order=order, cval=fill)
    if out is not None:
        return out

    def warp2d(plane):
        return affine_transform(plane.astype(np.float32), matrix, offset=offset,
                                order=order, mode="constant", cval=fill)

    if img.ndim == 2:
        out = warp2d(img)
    else:
        flat = img.reshape(-1, h, w)
        out = np.stack([warp2d(p) for p in flat]).reshape(img.shape)
    if np.issubdtype(img.dtype, np.integer):
        return np.round(out).astype(img.dtype)
    return out.astype(img.dtype)


# ---------------------------------------------------------------------------
# Pretraining augmentation (DataAugmentationForMIRAGE)
# ---------------------------------------------------------------------------

LABEL_TASKS = ("layermaps", "bscanlayermap", "semseg")


class PretrainAugment:
    """Correlated multi-modality augmentation for MultiMAE pretraining.

    input_size: task -> (H, W). SLO is an enface projection while bscan /
    bscanlayermap are the same cross-section, so the affine is shared between
    bscan & layermap but SLO only follows the x-translation
    (datasets_pretrain.py:54-59).
    """

    def __init__(self, input_size: Mapping[str, Tuple[int, int]], *,
                 hflip: float = 0.5, intensity_shift: float = 0.05,
                 affine: bool = True, degrees: float = 10.0,
                 translate=(0.1, 0.1), scale=(0.9, 1.1), shear: float = 5.0):
        self.input_size = {k: tuple(v) for k, v in input_size.items()}
        self.hflip = hflip
        self.intensity_shift = intensity_shift
        self.affine = affine
        self.affine_cfg = dict(degrees=degrees, translate=translate,
                               scale=scale, shear=shear)

    def __call__(self, task_dict: Dict[str, np.ndarray],
                 rng: np.random.Generator) -> Dict[str, np.ndarray]:
        flip = rng.random() < self.hflip
        # The hard-coded (512, 512) is intentional: the reference samples
        # affine params against [512, 512] regardless of the raw image size
        # and warps at raw resolution before resizing
        # (mutils/datasets_pretrain.py:37-41) — matching it exactly.
        params = random_affine_params(rng, img_size=(512, 512), **self.affine_cfg)
        out = {}
        for task, img in task_dict.items():
            img = np.asarray(img)
            if flip:
                img = img[..., ::-1]
            is_label = task in LABEL_TASKS
            if self.intensity_shift > 0 and not is_label:
                shift = float(rng.normal(0, self.intensity_shift))
                if rng.random() < 0.5:
                    shift = -shift
                img = np.clip(img + shift, 0.0, 1.0)
            if self.affine:
                angle, (tx, ty), s, sh = params
                if task in ("bscan", "bscanlayermap"):
                    img = affine_warp(img, angle, (tx, ty), s, sh,
                                      order=0 if is_label else 1)
                else:
                    # SLO: x-translation only
                    img = affine_warp(img, 0.0, (tx, 0.0), s, 0.0,
                                      order=0 if is_label else 1)
            size = self.input_size[task]
            if img.shape[-2:] != size:
                img = resize_np(img, size, mode="nearest" if is_label else "bilinear")
            if is_label:
                out[task] = np.ascontiguousarray(img).astype(np.int32)
            else:
                arr = np.ascontiguousarray(img).astype(np.float32)
                out[task] = arr[None] if arr.ndim == 2 else arr  # (C, H, W)
        return out


# ---------------------------------------------------------------------------
# Semantic-segmentation transform (simple_transform equivalent)
# ---------------------------------------------------------------------------

class SemSegTransform:
    """Shared-geometry transform over {in_domain image, 'semseg' mask}.

    train: HFlip(0.5) -> Resize(1.1 * input) -> shared RandomCrop(input);
    eval: Resize(input). Norm modes: 'minmax' (identity: images arrive in
    [0,1]), 'imagenet' (ToRGB + imagenet standardize), 'sam' (ToRGB + [0,255]
    range), 'z-score' (ToRGB + standardize mean0 std1 on [0,1] values).
    """

    def __init__(self, train: bool, input_size: int = 512, norm: str = "minmax",
                 mask_key: str = "semseg"):
        self.train = train
        self.input_size = int(input_size)
        self.norm = norm
        self.mask_key = mask_key

    def _normalize(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W) or (H, W, C) float."""
        if self.norm == "minmax":
            return img
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        elif img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if self.norm == "imagenet":
            mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)
            std = np.asarray(IMAGENET_DEFAULT_STD, np.float32)
            return (img - mean) / std
        if self.norm == "sam":
            lo, hi = img.min(), img.max()
            return (img - lo) * 255.0 / max(hi - lo, 1e-12)
        if self.norm == "z-score":
            # A.Normalize(mean=0, std=1) keeps its default max_pixel_value=255,
            # so the reference effectively divides the [0,1] input by 255 again
            # (mutils/datasets_semseg.py:66-71) — reproduce that quirk exactly.
            return img.astype(np.float32) / 255.0
        raise ValueError(f"Unknown norm mode {self.norm}")

    def __call__(self, task_dict: Dict[str, np.ndarray],
                 rng: np.random.Generator) -> Dict[str, np.ndarray]:
        size = self.input_size
        out = {}
        if self.train:
            init = size + int(size * 0.1)
            flip = rng.random() < 0.5
            y0 = int(rng.integers(0, init - size + 1))
            x0 = int(rng.integers(0, init - size + 1))
            for task, img in task_dict.items():
                img = np.asarray(img)
                if flip:
                    img = img[..., ::-1]
                is_mask = task == self.mask_key
                img = resize_np(img, (init, init),
                                mode="nearest" if is_mask else "bilinear")
                img = img[..., y0:y0 + size, x0:x0 + size]
                out[task] = img
        else:
            for task, img in task_dict.items():
                is_mask = task == self.mask_key
                out[task] = resize_np(np.asarray(img), (size, size),
                                      mode="nearest" if is_mask else "bilinear")
        final = {}
        for task, img in out.items():
            if task == self.mask_key:
                final[task] = np.ascontiguousarray(img).astype(np.int32)
            else:
                img = self._normalize(img.astype(np.float32))
                if img.ndim == 2:
                    img = img[None]  # (1, H, W)
                else:
                    img = img.transpose(2, 0, 1)  # HWC -> CHW
                final[task] = np.ascontiguousarray(img, np.float32)
        return final


# ---------------------------------------------------------------------------
# Classification transforms (mutils/transforms.py)
# ---------------------------------------------------------------------------

def minmax_norm(img: np.ndarray, per_channel: bool = True) -> np.ndarray:
    """MinMaxNorm(Channel): (x - min) / (max - min), per channel of CHW."""
    img = img.astype(np.float32)
    axes = (-2, -1) if per_channel else None
    lo = img.min(axis=axes, keepdims=True) if axes else img.min()
    hi = img.max(axis=axes, keepdims=True) if axes else img.max()
    return (img - lo) / np.maximum(hi - lo, 1e-12)


def naive_norm(img: np.ndarray) -> np.ndarray:
    """NaiveNorm: /255 for uint8-range data, /65535 for uint16-range."""
    img = img.astype(np.float32)
    return img / (65535.0 if img.max() > 255.0 else 255.0) \
        if img.max() > 1.0 else img


def to_rgb(img: np.ndarray) -> np.ndarray:
    """(1, H, W) or (H, W) -> (3, H, W)."""
    if img.ndim == 2:
        img = img[None]
    if img.shape[0] == 1:
        img = np.repeat(img, 3, axis=0)
    return img


class RandomIntensityChannel:
    """Per-channel multiplicative intensity jitter x U(0.8, 1.2), clamp [0,1]
    (mutils/transforms.py:69-104), p-gated."""

    def __init__(self, scale=(0.8, 1.2), p: float = 0.5):
        self.scale = scale
        self.p = p

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() >= self.p:
            return img
        c = img.shape[0]
        factors = rng.uniform(self.scale[0], self.scale[1], size=(c, 1, 1))
        return np.clip(img * factors.astype(np.float32), 0.0, 1.0)


class RandomAffineChannel:
    """Per-channel random affine, p-gated (mutils/transforms.py:107-148).

    Reference semantics replicated exactly: the whole transform applies with
    probability p (reference default 1.0 — fm_cls_config.py:59 passes no p),
    each CHANNEL is then transformed only 90% of the time
    (transforms.py:137-138), and the magic value fill == 0.5 draws a random
    fill from [img.min, img.max] per invocation (transforms.py:125-126)."""

    def __init__(self, degrees: float = 10.0, translate=(0.1, 0.1),
                 scale=(0.9, 1.1), shear: float = 5.0, p: float = 1.0,
                 fill: Optional[float] = 0.0, channel_p: float = 0.9):
        self.cfg = dict(degrees=degrees, translate=translate, scale=scale,
                        shear=shear)
        self.p = p
        self.fill = 0.0 if fill is None else fill  # torchvision None -> 0
        self.channel_p = channel_p

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() >= self.p:
            return img
        if self.fill == 0.5:  # reference magic value: random in-range fill
            fill = float(rng.uniform(float(img.min()), float(img.max())))
        else:
            fill = self.fill
        out = img.copy()
        for c in range(img.shape[0]):
            if rng.random() >= self.channel_p:
                continue
            angle, t, s, sh = random_affine_params(
                rng, img_size=img.shape[-2:], **self.cfg)
            out[c] = affine_warp(img[c], angle, t, s, sh, order=1, fill=fill)
        return out


class ClsTransform:
    """fm_cls_config.build_transform equivalent: resize(bilinear) ->
    grayscale -> [0,1] minmax -> train augs (flip / intensity / affine) ->
    model norm ('minmax' per channel, or imagenet RGB)."""

    def __init__(self, input_size: int = 512, train: bool = False,
                 norm: str = "minmax", hflip: float = 0.5,
                 intensity: bool = True, affine: bool = True,
                 fill: Optional[float] = 0.0):
        self.input_size = int(input_size)
        self.train = train
        self.norm = norm
        self.hflip = hflip
        self.intensity = RandomIntensityChannel() if intensity else None
        self.affine = RandomAffineChannel(fill=fill) if affine else None

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """img: (H, W) or (H, W, C) raw -> (C, H, W) float32."""
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(axis=-1)  # grayscale
        img = resize_np(img, (self.input_size, self.input_size), mode="bilinear")
        img = minmax_norm(img[None])
        if self.train:
            if rng.random() < self.hflip:
                img = img[..., ::-1].copy()
            if self.intensity is not None:
                img = self.intensity(img, rng)
            if self.affine is not None:
                img = self.affine(img, rng)
        if self.norm == "imagenet":
            img = to_rgb(img)
            mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32).reshape(3, 1, 1)
            std = np.asarray(IMAGENET_DEFAULT_STD, np.float32).reshape(3, 1, 1)
            img = (img - mean) / std
        else:
            img = minmax_norm(img)
        return np.ascontiguousarray(img, np.float32)
