"""Segmentation losses: cross-entropy (with optional ignore_index) and
CE + Generalized Dice.

Parity: mutils/gdice.py — GeneralizedDiceLoss (w = 1/vol^2, inf -> row max
fixup, smooth 1e-5, softmax+one-hot path used by seg tuning) and
CEGDiceLoss = 0.5*CE + 0.5*GDice (run_seg_tuning.py:614-623). Plus the plain
CE / CE-ignore-background modes (run_seg_tuning.py:348-354).

All functions are pure and jit-friendly (fixed shapes, f32 accumulation).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits, target, *, ignore_index: Optional[int] = None,
                       label_smoothing: float = 0.0, weights=None,
                       normalize: bool = True):
    """logits: (B, C, *spatial) f32; target: (B, *spatial) int.
    Mean over non-ignored pixels (torch CrossEntropyLoss semantics).
    weights: optional per-element weights broadcastable to target's shape
    (e.g. zeros for batch-padding rows); loss = sum(w*nll)/sum(w).
    normalize=False returns the pair (sum(w*nll), sum(w)) instead, so a
    data-parallel shard_map caller can psum both before dividing — the
    per-shard weighted means do NOT recombine into the global weighted mean
    when shards carry unequal weight totals (e.g. all the padding rows)."""
    c = logits.shape[1]
    logits = jnp.moveaxis(logits, 1, -1).astype(jnp.float32)  # (B, *s, C)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot reduction instead of take_along_axis: a gather over the class
    # dim degenerates to scalar loads on TPU (measured 130 ms/step at
    # 8x1024x1024x8 vs ~2 ms for the vectorized select-sum)
    onehot = jax.nn.one_hot(target, c, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if ignore_index is not None or weights is not None:
        valid = jnp.ones(nll.shape, jnp.float32)
        if ignore_index is not None:
            valid = valid * (target != ignore_index).astype(jnp.float32)
        if weights is not None:
            w = weights.astype(jnp.float32)
            if w.ndim == 1:  # per-sample: align to the leading batch axis
                w = w.reshape((w.shape[0],) + (1,) * (nll.ndim - 1))
            valid = valid * jnp.broadcast_to(w, nll.shape)
        if not normalize:
            return jnp.sum(nll * valid), jnp.sum(valid)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    if not normalize:
        return jnp.sum(nll), jnp.asarray(float(nll.size), jnp.float32)
    return jnp.mean(nll)


def generalized_dice_loss(logits, target, *, include_background: bool = True,
                          softmax: bool = True, smooth: float = 1e-5):
    """logits: (B, C, *spatial); target: (B, *spatial) int labels.

    w_c = 1 / (sum_x onehot_c)^2 per sample; infinite weights (empty classes)
    are replaced by the max finite weight of that sample (gdice.py:178-181).
    Returns the batch-mean loss.
    """
    c = logits.shape[1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1) if softmax \
        else logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(target, c, axis=1, dtype=jnp.float32)
    if not include_background:
        probs = probs[:, 1:]
        onehot = onehot[:, 1:]

    reduce_axes = tuple(range(2, probs.ndim))
    intersection = jnp.sum(onehot * probs, axis=reduce_axes)  # (B, C)
    ground_o = jnp.sum(onehot, axis=reduce_axes)
    pred_o = jnp.sum(probs, axis=reduce_axes)
    denominator = ground_o + pred_o

    w = 1.0 / jnp.square(ground_o)
    finite = jnp.isfinite(w)
    w0 = jnp.where(finite, w, 0.0)
    row_max = jnp.max(w0, axis=1, keepdims=True)
    w = jnp.where(finite, w0, row_max)

    f = 1.0 - (2.0 * jnp.sum(intersection * w, axis=1) + smooth) / (
        jnp.sum(denominator * w, axis=1) + smooth)
    return jnp.mean(f)


def ce_gdice_loss(logits, target, *, ce_weight: float = 0.5,
                  include_background: bool = True):
    """CEGDiceLoss (gdice.py:197-228): ce_weight*CE + (1-ce_weight)*GDice."""
    ce = cross_entropy_loss(logits, target)
    gd = generalized_dice_loss(logits, target,
                               include_background=include_background)
    return ce_weight * ce + (1.0 - ce_weight) * gd
