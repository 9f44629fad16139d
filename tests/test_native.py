"""Native fast-ops library: exactness vs the numpy/torch reference paths and
the fallback contract."""

import numpy as np
import pytest

from mirage_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_resize_bilinear_matches_matrix(rng):
    from mirage_tpu.nn.resize import _resize_matrix

    x = rng.random((3, 37, 53)).astype(np.float32)
    got = native.resize_bilinear(x, (64, 48))
    wh = _resize_matrix(37, 64, "bilinear", False)
    ww = _resize_matrix(53, 48, "bilinear", False)
    want = np.einsum("oh,chw->cow", wh, x)
    want = np.einsum("pw,chw->chp", ww, want)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_matches_torch(rng):
    torch = pytest.importorskip("torch")

    x = rng.random((2, 40, 40)).astype(np.float32)
    got = native.resize_bilinear(x, (31, 57))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], size=(31, 57), mode="bilinear")[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    torch = pytest.importorskip("torch")

    x = rng.integers(0, 9, (2, 33, 21)).astype(np.int64)
    got = native.resize_nearest(x, (17, 40))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.astype(np.float32))[None], size=(17, 40),
        mode="nearest")[0].numpy().astype(np.int64)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == x.dtype


def test_u8_to_f32(rng):
    x = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    got = native.u8_to_f32(x)
    np.testing.assert_allclose(got, x.astype(np.float32) / 255.0, atol=1e-7)


def test_minmax_norm(rng):
    x = (rng.random((4, 16, 16)) * 50 + 3).astype(np.float32)
    want = np.stack([(p - p.min()) / (p.max() - p.min()) for p in x])
    got = native.minmax_norm_inplace(x.copy())
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_np_dispatches_native(rng):
    """resize_np output is identical whether native runs or not."""
    from mirage_tpu.data.augment import resize_np

    x = rng.random((2, 50, 60)).astype(np.float32)
    got = resize_np(x, (64, 64), mode="bilinear")
    from mirage_tpu.nn.resize import _resize_matrix

    wh = _resize_matrix(50, 64, "bilinear", False)
    ww = _resize_matrix(60, 64, "bilinear", False)
    want = np.einsum("pw,chw->chp", ww, np.einsum("oh,chw->cow", wh, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_affine_warp_matches_scipy(rng):
    from scipy.ndimage import affine_transform

    x = rng.random((3, 48, 48)).astype(np.float32)
    th = 0.31
    matrix = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    offset = np.array([3.7, -2.1])
    got = native.affine_warp(x, matrix, offset, order=1, cval=0.5)
    want = np.stack([affine_transform(p, matrix, offset=offset, order=1,
                                      mode="constant", cval=0.5) for p in x])
    np.testing.assert_allclose(got, want, atol=1e-5)

    # boundary semantics: scipy's 'constant' mode fills pure cval for any
    # source coordinate outside [0, n-1] (no edge/cval blending) and the
    # native kernel matches it exactly — pin with sub-pixel shifts that land
    # source coords in (-1, 0) and (n-1, n)
    for off in ((-0.5, 0.0), (0.0, 0.49), (0.51, -0.3)):
        got = native.affine_warp(x, np.eye(2), np.asarray(off), order=1, cval=-7.0)
        want = np.stack([affine_transform(p, np.eye(2), offset=np.asarray(off),
                                          order=1, mode="constant", cval=-7.0)
                         for p in x])
        np.testing.assert_allclose(got, want, atol=1e-5)

    labels = rng.integers(0, 7, (2, 40, 40)).astype(np.int32)
    got = native.affine_warp(labels, matrix, offset, order=0, cval=0)
    want = np.stack([affine_transform(p, matrix, offset=offset, order=0,
                                      mode="constant", cval=0) for p in labels])
    assert (got == want).mean() > 0.995  # .5-boundary rounding may differ
    assert got.dtype == labels.dtype


def test_augment_affine_warp_uses_native(rng):
    """data.augment.affine_warp gives identical output through the native
    dispatch and the scipy fallback."""
    import mirage_tpu.utils.native as nat
    from mirage_tpu.data.augment import affine_warp

    img = rng.random((64, 64)).astype(np.float32)
    got = affine_warp(img, 8.0, (3, -2), 1.05, 2.0)
    real_load = nat._load
    try:
        nat._load = lambda: None  # force scipy fallback
        want = affine_warp(img, 8.0, (3, -2), 1.05, 2.0)
    finally:
        nat._load = real_load
    np.testing.assert_allclose(got, want, atol=1e-5)
