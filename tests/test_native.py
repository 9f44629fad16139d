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
