"""Patch-space (token) losses == pixel-space losses, values AND gradients.

The token losses (losses/masked.py masked_{mse,ce}_loss_tokens) consume the
output adapters' pre-unpatchify tokens; these tests pin that they compute
exactly what the pixel path computes on unpatchify(tokens) — including the
empty-mask nanmean exclusion and norm_pix/label-smoothing variants — so the
MIRAGE_LOSS_SPACE=token training path cannot drift from reference semantics
(mirage/criterion.py:11-51, :70-117).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirage_tpu.losses.masked import (masked_ce_loss, masked_ce_loss_tokens,
                                      masked_mse_loss, masked_mse_loss_tokens)
from mirage_tpu.ops.patch_embed import unpatchify


def _mask(rng, b, n):
    m = (rng.random((b, n)) < 0.5).astype(np.float32)
    m[0] = 0.0  # empty mask: sample excluded by the nanmean
    m[1] = 1.0  # fully masked
    return jnp.asarray(m)


@pytest.mark.parametrize("norm_pix", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_mse_tokens_matches_pixel(rng, norm_pix, masked):
    b, c, h, p = 3, 2, 16, 4
    nh = h // p
    n = nh * nh
    tokens = jnp.asarray(rng.standard_normal((b, n, c * p * p)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((b, c, h, h)), jnp.float32)
    mask = _mask(rng, b, n) if masked else None

    def pixel(tok):
        pred = unpatchify(tok, nh, nh, p, p, c)
        return masked_mse_loss(pred, target, mask, patch_size=p,
                               norm_pix=norm_pix)

    def token(tok):
        return masked_mse_loss_tokens(tok, target, mask, patch_size=p,
                                      norm_pix=norm_pix)

    want, gw = jax.value_and_grad(pixel)(tokens)
    got, gg = jax.value_and_grad(token)(tokens)
    np.testing.assert_allclose(float(got), float(want), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("masked", [False, True])
def test_ce_tokens_matches_pixel(rng, smoothing, masked):
    b, c, h, p = 3, 5, 8, 2
    nh = h // p
    n = nh * nh
    tokens = jnp.asarray(rng.standard_normal((b, n, c * p * p)), jnp.float32)
    target = jnp.asarray(rng.integers(0, c, (b, h, h)), jnp.int32)
    mask = _mask(rng, b, n) if masked else None

    def pixel(tok):
        logits = unpatchify(tok, nh, nh, p, p, c)
        return masked_ce_loss(logits, target, mask, patch_size=p,
                              label_smoothing=smoothing)

    def token(tok):
        return masked_ce_loss_tokens(tok, target, mask, patch_size=p,
                                     label_smoothing=smoothing)

    want, gw = jax.value_and_grad(pixel)(tokens)
    got, gg = jax.value_and_grad(token)(tokens)
    np.testing.assert_allclose(float(got), float(want), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               atol=1e-6, rtol=1e-5)


def test_pretrain_loss_token_space_matches(rng, monkeypatch):
    """End-to-end: make_pretrain_loss under MIRAGE_LOSS_SPACE=token produces
    the same total/per-task losses and parameter gradients as the default
    pixel path (same rng -> same Dirichlet masks)."""
    from test_parallel import make_batch, tiny_pretrain_model
    from mirage_tpu.train import steps

    model = tiny_pretrain_model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(batch=2)
    conf = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
            "slo": {"loss": "mse", "patch_size": 32, "norm_pix": False},
            "bscanlayermap": {"loss": "ce", "patch_size": 8}}

    def build(space):
        monkeypatch.setattr(steps, "_LOSS_SPACE", space)
        return steps.make_pretrain_loss(model, conf, num_encoded_tokens=12)

    key = jax.random.PRNGKey(7)
    (want, aux_w), gw = jax.value_and_grad(build("pixel"), has_aux=True)(
        params, batch, key)
    (got, aux_g), gg = jax.value_and_grad(build("token"), has_aux=True)(
        params, batch, key)
    np.testing.assert_allclose(float(got), float(want), atol=1e-5, rtol=1e-5)
    for t in aux_w:
        np.testing.assert_allclose(float(aux_g[t]), float(aux_w[t]),
                                   atol=1e-5, rtol=1e-5)
    from jax.flatten_util import ravel_pytree

    flat_w, _ = ravel_pytree(gw)
    flat_g, _ = ravel_pytree(gg)
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_w),
                               atol=1e-4, rtol=1e-3)
