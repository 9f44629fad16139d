"""Masked loss parity vs mirage/criterion.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from mirage_tpu.losses.masked import masked_ce_loss, masked_mse_loss

from conftest import requires_reference

torch = pytest.importorskip("torch")


@requires_reference
@pytest.mark.parametrize("norm_pix", [False, True])
def test_masked_mse(reference_path, rng, norm_pix):
    from mirage.criterion import MaskedMSELoss

    crit = MaskedMSELoss(patch_size=32, stride=1, norm_pix=norm_pix)
    pred = rng.standard_normal((2, 1, 512, 512)).astype(np.float32)
    target = rng.standard_normal((2, 1, 512, 512)).astype(np.float32)
    mask = (rng.random((2, 256)) < 0.7).astype(np.int64)
    ref = crit(torch.from_numpy(pred), torch.from_numpy(target),
               torch.from_numpy(mask)).item()
    got = float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                jnp.asarray(mask), patch_size=32, norm_pix=norm_pix))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@requires_reference
def test_masked_mse_zero_mask_sample(reference_path, rng):
    from mirage.criterion import MaskedMSELoss

    crit = MaskedMSELoss(patch_size=32, stride=1)
    pred = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    target = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    mask = np.zeros((2, 4), np.int64)
    mask[0] = [1, 0, 1, 0]  # sample 1 fully unmasked -> NaN excluded
    ref = crit(torch.from_numpy(pred), torch.from_numpy(target),
               torch.from_numpy(mask)).item()
    got = float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                jnp.asarray(mask), patch_size=32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # all-zero mask -> 0
    zero = np.zeros((2, 4), np.int64)
    assert float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                 jnp.asarray(zero), patch_size=32)) == 0.0


@requires_reference
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_masked_ce(reference_path, rng, smoothing):
    from mirage.criterion import MaskedCrossEntropyLoss

    crit = MaskedCrossEntropyLoss(patch_size=(8, 8), stride=1,
                                  label_smoothing=smoothing)
    logits = rng.standard_normal((2, 13, 128, 128)).astype(np.float32)
    target = rng.integers(0, 13, (2, 128, 128))
    mask = (rng.random((2, 256)) < 0.6).astype(np.int64)
    ref = crit(torch.from_numpy(logits), torch.from_numpy(target),
               torch.from_numpy(mask)).item()
    got = float(masked_ce_loss(jnp.asarray(logits), jnp.asarray(target, dtype=jnp.int32),
                               jnp.asarray(mask), patch_size=8,
                               label_smoothing=smoothing))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
