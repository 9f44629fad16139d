"""Torch-parity tests for the matmul-based separable resize (nn/resize.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mirage_tpu.nn.resize import resize2d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


CASES = [
    # (in, out, mode, align_corners)
    ((16, 16), (16, 16), "bicubic", False),
    ((16, 16), (32, 32), "bicubic", False),
    ((16, 16), (8, 8), "bicubic", False),
    ((16, 16), (17, 31), "bicubic", False),
    ((16, 16), (32, 32), "bilinear", False),
    ((16, 16), (32, 32), "bilinear", True),
    ((16, 16), (7, 9), "bilinear", False),
    ((16, 16), (64, 64), "nearest", None),
    ((33, 17), (128, 128), "nearest", None),
    ((10, 10), (4, 4), "nearest", None),
    ((8, 8), (16, 16), "bilinear", True),
]


@pytest.mark.parametrize("in_hw,out_hw,mode,align", CASES)
def test_resize_matches_torch(in_hw, out_hw, mode, align, rng):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    t = torch.from_numpy(x)
    if mode == "nearest":
        ref = F.interpolate(t, size=out_hw, mode="nearest")
        got = resize2d(jnp.asarray(x), out_hw, mode="nearest")
    else:
        ref = F.interpolate(t, size=out_hw, mode=mode, align_corners=align)
        got = resize2d(jnp.asarray(x), out_hw, mode=mode, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_scale_factor_downsample_matches_torch(rng):
    # SemSeg interpolate_class_emb path: Upsample(scale_factor=1/8, bilinear)
    x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
    t = torch.from_numpy(x)
    ref = torch.nn.Upsample(scale_factor=(1 / 8, 1 / 8), mode="bilinear")(t)
    got = resize2d(jnp.asarray(x), (8, 8), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)
