"""Dirichlet task masking: index-math invariants and distribution sanity
(mirage/model.py:145-239 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from mirage_tpu.masking.masking import (
    generate_random_masks,
    masks_to_indices,
    sample_alphas,
)

TOKENS = [16, 16, 4]  # three tasks
B = 32
ENC = 12


def test_exact_visible_count_and_consistency():
    masks, ids_keep, ids_restore = generate_random_masks(
        jax.random.PRNGKey(0), TOKENS, B, ENC, alphas=1.0)
    mask_all = np.concatenate([np.asarray(m) for m in masks], axis=1)
    n = sum(TOKENS)
    assert mask_all.shape == (B, n)
    # exactly ENC visible per sample after the rounding fixup
    np.testing.assert_array_equal((mask_all == 0).sum(axis=1), ENC)
    # ids_keep indexes exactly the visible positions
    keep = np.asarray(ids_keep)
    for i in range(B):
        assert set(keep[i]) == set(np.nonzero(mask_all[i] == 0)[0])
    # ids_restore is the inverse permutation of the shuffle
    restore = np.asarray(ids_restore)
    for i in range(B):
        assert sorted(restore[i]) == list(range(n))


def test_dirichlet_spreads_tokens_across_tasks():
    """With alpha=1 and many samples, every task gets visible tokens on
    average (no degenerate all-one-task masking)."""
    masks, _, _ = generate_random_masks(
        jax.random.PRNGKey(1), TOKENS, 512, ENC, alphas=1.0)
    for m, n_task in zip(masks, TOKENS):
        visible = (np.asarray(m) == 0).sum(axis=1).mean()
        assert visible > 0.5, visible  # each task visible on average


def test_sample_alphas_subsets():
    """sample_alphas zeroes out a random non-empty task subset per sample."""
    conc = np.asarray(sample_alphas(jax.random.PRNGKey(2), 256, 3, alphas=1.0))
    assert conc.shape == (256, 3)
    on = conc > 0.5
    assert (on.sum(axis=1) >= 1).all()  # never the empty subset
    assert on.sum(axis=1).min() == 1 and on.sum(axis=1).max() == 3
    # eps floor keeps the Dirichlet well-defined for "off" tasks
    assert conc.min() > 0


def test_masks_to_indices_roundtrip():
    """Explicit-mask path: gather(ids_keep) selects exactly the unmasked
    tokens in order; restore unshuffles."""
    rng = np.random.default_rng(0)
    masks = {}
    order = ["a", "b"]
    sizes = {"a": 8, "b": 8}
    num_visible = 6
    for t in order:
        m = np.ones((4, sizes[t]), np.int32)
        masks[t] = m
    # choose num_visible visible positions per sample across both tasks
    for i in range(4):
        flat_idx = rng.choice(16, num_visible, replace=False)
        for j in flat_idx:
            t, off = ("a", j) if j < 8 else ("b", j - 8)
            masks[t][i, off] = 0
    jmasks = {t: jnp.asarray(v) for t, v in masks.items()}
    ids_keep, ids_restore = masks_to_indices(jmasks, order, num_visible)
    mask_all = np.concatenate([masks[t] for t in order], axis=1)
    keep = np.asarray(ids_keep)
    for i in range(4):
        assert set(keep[i]) == set(np.nonzero(mask_all[i] == 0)[0])
    # stable argsort keeps original ordering among visibles
    for i in range(4):
        assert list(keep[i]) == sorted(keep[i])


def test_generate_masks_jittable():
    f = jax.jit(lambda k: generate_random_masks(k, tuple(TOKENS), B, ENC))
    masks, ids_keep, _ = f(jax.random.PRNGKey(3))
    assert ids_keep.shape == (B, ENC)


def test_onehot_gather_scatter_rows_match_take_along_axis():
    """The one-hot matmul forms (TPU gather-degeneration fix) are exact
    equivalents of take_along_axis / mask-token unshuffle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirage_tpu.masking.masking import (
        masks_to_indices, onehot_gather_rows, onehot_scatter_rows)

    rng = np.random.default_rng(3)
    b, n, d, nvis = 4, 24, 16, 9
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    ids = jnp.asarray(
        np.stack([rng.permutation(n)[:nvis] for _ in range(b)]).astype(np.int32))
    got = onehot_gather_rows(x, ids)
    want = jnp.take_along_axis(x, ids[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    # scatter: equivalent to the reference's concat(vis, mask) + ids_restore
    vis = jnp.asarray(rng.standard_normal((b, nvis, d)).astype(np.float32))
    fill = jnp.asarray(rng.standard_normal((1, d)).astype(np.float32))
    masks = {"t": jnp.asarray(
        np.stack([np.isin(np.arange(n), np.asarray(ids)[i], invert=True)
                  for i in range(b)]).astype(np.int32))}
    ids_keep, ids_restore = masks_to_indices(masks, ["t"], nvis)
    vis_sorted = onehot_gather_rows(  # reorder vis into ids_keep order
        vis, jnp.argsort(jnp.argsort(ids, axis=1), axis=1))
    got = onehot_scatter_rows(vis_sorted, ids_keep, n, fill)
    concat = jnp.concatenate(
        [vis_sorted, jnp.broadcast_to(fill, (b, n - nvis, d))], axis=1)
    want = jnp.take_along_axis(concat, ids_restore[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
