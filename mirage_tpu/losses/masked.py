"""Masked reconstruction losses for MultiMAE pretraining.

Parity: mirage/criterion.py — MaskedCrossEntropyLoss (:11-51) and
MaskedMSELoss (:70-117) including the norm_pix per-patch standardization,
nearest-neighbor mask upsampling, per-sample masked mean, and nanmean over
the batch (samples whose mask is empty contribute NaN and are excluded).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mirage_tpu.nn.resize import resize2d
from mirage_tpu.ops.patch_embed import patchify, unpatchify


def _upsample_mask(mask, nh, nw, h, w):
    """(B, nh*nw) token mask -> (B, H, W) pixel mask via nearest upsample."""
    m = mask.reshape(mask.shape[0], nh, nw).astype(jnp.float32)
    return resize2d(m, (h, w), mode="nearest")


def _masked_mean(loss_pix, mask_pix):
    """Per-sample masked mean then nanmean over batch (criterion.py:46-47)."""
    num = jnp.sum(loss_pix.reshape(loss_pix.shape[0], -1), axis=1)
    den = jnp.sum(mask_pix.reshape(mask_pix.shape[0], -1), axis=1)
    valid = den > 0
    # divide by a SAFE denominator: num/den with den==0 is excluded from the
    # value by the where() below, but its backward would still be NaN
    # (0 * d(1/0) = 0*inf) and poison every gradient — e.g. whenever the
    # Dirichlet mask leaves one task fully visible (num == 0 there, so the
    # safe division is exact)
    per_sample = num / jnp.maximum(den, 1.0)
    total = jnp.sum(jnp.where(valid, per_sample, 0.0))
    count = jnp.sum(valid)
    # zero-mask guard (criterion.py:36-37, :103-104): all-empty -> 0 loss
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def masked_mse_loss(pred, target, mask: Optional[jax.Array] = None,
                    patch_size: int = 16, stride: int = 1, norm_pix: bool = False):
    """pred/target: (B, C, H, W); mask: (B, N) with 1 = masked (loss there)."""
    scale = patch_size // stride
    h, w = pred.shape[-2:]
    nh, nw = h // scale, w // scale
    if norm_pix:
        t = patchify(target, scale, scale)
        # NOTE: reference patchifies with (p1 p2 c) order; stats are over the
        # whole patch so flat order is irrelevant.
        mean = t.mean(axis=-1, keepdims=True)
        var = t.var(axis=-1, keepdims=True, ddof=1)  # torch var is unbiased
        t = (t - mean) / jnp.sqrt(var + 1e-6)
        target = unpatchify(t, nh, nw, scale, scale, target.shape[1])
    loss = (pred - target) ** 2
    if mask is None:
        return loss.mean()
    loss = loss.mean(axis=1)  # (B, H, W)
    mask_pix = _upsample_mask(mask, nh, nw, h, w)
    return _masked_mean(loss * mask_pix, mask_pix)


def masked_mse_loss_tokens(pred_tokens, target, mask: Optional[jax.Array] = None,
                           patch_size: int = 16, stride: int = 1,
                           norm_pix: bool = False):
    """Patch-space form of masked_mse_loss — algebraically identical, no
    pixel-space arrays.

    pred_tokens: (B, N, C*p*p), the output adapter's pre-unpatchify tokens
    ((c, ph, pw) flat order); target: (B, C, H, W).

    Equivalence (criterion.py:70-117 semantics): the pixel path's channel
    mean + nearest-upsampled token mask make every pixel of patch i carry
    weight mask[i], so the per-sample masked mean over pixels equals the
    masked mean over patches of the per-patch mean squared error. This skips
    unpatchify(pred), the (B, H, W) mask upsample, and the pixel loss/mask
    streams (at the pretraining shapes: three ~270 MB HBM streams + their
    backward mirrors). Exactness pinned by tests/test_loss_tokens.py.
    """
    scale = patch_size // stride
    t = patchify(target, scale, scale)
    if norm_pix:
        mean = t.mean(axis=-1, keepdims=True)
        var = t.var(axis=-1, keepdims=True, ddof=1)
        t = (t - mean) / jnp.sqrt(var + 1e-6)
    loss_p = jnp.mean((pred_tokens - t) ** 2, axis=-1)  # (B, N)
    if mask is None:
        return loss_p.mean()
    m = mask.astype(loss_p.dtype)
    return _masked_mean(loss_p * m, m)


def masked_ce_loss_tokens(logits_tokens, target, mask: Optional[jax.Array] = None,
                          patch_size: int = 16, stride: int = 1,
                          label_smoothing: float = 0.0):
    """Patch-space form of masked_ce_loss (same equivalence argument as
    masked_mse_loss_tokens; softmax/one-hot run per pixel either way, but
    the class axis lands minor-most and the unpatchify/mask-upsample layout
    ops disappear).

    logits_tokens: (B, N, C*p*p) in (c, ph, pw) flat order;
    target: (B, H, W) int.
    """
    scale = patch_size // stride
    b, n, flat = logits_tokens.shape
    pix = scale * scale
    c = flat // pix
    lg = logits_tokens.reshape(b, n, c, pix).astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=2)
    t = patchify(target[:, None], scale, scale)  # (B, N, p*p) int
    onehot = jax.nn.one_hot(t, c, axis=2, dtype=logp.dtype)  # (B, N, C, p*p)
    nll = -jnp.sum(logp * onehot, axis=2)  # (B, N, p*p)
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=2)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    loss_p = nll.mean(axis=-1)  # (B, N)
    if mask is None:
        return loss_p.mean()
    m = mask.astype(loss_p.dtype)
    return _masked_mean(loss_p * m, m)


def masked_ce_loss(logits, target, mask: Optional[jax.Array] = None,
                   patch_size: int = 16, stride: int = 1,
                   label_smoothing: float = 0.0):
    """logits: (B, C, H, W); target: (B, H, W) int; mask: (B, N)."""
    scale = patch_size // stride
    h, w = logits.shape[-2:]
    nh, nw = h // scale, w // scale
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    # one-hot reduction: class-dim gathers degenerate to scalar loads on TPU
    onehot = jax.nn.one_hot(target, logp.shape[1], axis=1, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=1)
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if mask is None:
        return nll.mean()
    mask_pix = _upsample_mask(mask, nh, nw, h, w)
    return _masked_mean(nll * mask_pix, mask_pix)
