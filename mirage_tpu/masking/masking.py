"""MultiMAE token masking: Dirichlet task sampling + random token selection.

Parity: mirage/model.py:145-239 (sample_alphas, generate_random_masks) and
the explicit-mask path (model.py:378-382).

TPU-native notes: everything is fixed-shape (num_encoded_tokens is static) so
the whole pipeline jits; randomness is jax.random key-threaded (no global
seed state); argsort-of-noise generates uniform random subsets exactly like
the reference's noise-shuffle trick.
"""

import itertools
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def sample_alphas(key, batch: int, n_tasks: int, alphas: Union[float, Sequence[float]] = 1.0,
                  eps: float = 1e-5):
    """Uniformly choose a non-empty task subset per sample, then scale by
    alphas (model.py:145-166). Returns (B, n_tasks) Dirichlet concentration."""
    choices = jnp.asarray(
        [list(c) for c in itertools.product([0, 1], repeat=n_tasks)][1:], jnp.float32)
    idx = jax.random.randint(key, (batch,), 0, choices.shape[0])
    alphas_arr = jnp.asarray(
        [alphas] * n_tasks if isinstance(alphas, float) else list(alphas), jnp.float32)
    return choices[idx] * alphas_arr + eps


def generate_random_masks(
    key,
    num_tokens_per_task: Sequence[int],
    batch: int,
    num_encoded_tokens: int,
    alphas: Union[float, Sequence[float]] = 1.0,
    sample_tasks_uniformly: bool = False,
) -> Tuple[List[jax.Array], jax.Array, jax.Array]:
    """Sample `num_encoded_tokens` visible tokens across tasks via Dirichlet
    sampling (model.py:168-239).

    Returns:
      task_masks: list of (B, n_i) int32, 0 = visible, 1 = masked
      ids_keep: (B, num_encoded_tokens) indices of visible tokens
      ids_restore: (B, N) unshuffle indices
    """
    n_tasks = len(num_tokens_per_task)
    k_alpha, k_dir, k_shuf = jax.random.split(key, 3)
    if sample_tasks_uniformly:
        conc = sample_alphas(k_alpha, batch, n_tasks, alphas)
        task_dist = jax.random.dirichlet(k_dir, conc)
    else:
        alphas_arr = jnp.asarray(
            [alphas] * n_tasks if isinstance(alphas, float) else list(alphas), jnp.float32)
        task_dist = jax.random.dirichlet(k_dir, alphas_arr, shape=(batch,))
    samples_per_task = jnp.round(task_dist * num_encoded_tokens).astype(jnp.int32)

    task_masks = []
    for i, n in enumerate(num_tokens_per_task):
        noise = jax.random.uniform(jax.random.fold_in(k_shuf, i), (batch, n))
        perm = jnp.argsort(noise, axis=1)  # uniform random permutation
        mask = jnp.where(perm < samples_per_task[:, i:i + 1], 0, 1)
        task_masks.append(mask)

    mask_all = jnp.concatenate(task_masks, axis=1)
    tiebreak = jax.random.uniform(jax.random.fold_in(k_shuf, n_tasks), mask_all.shape)
    ids_shuffle = jnp.argsort(mask_all.astype(jnp.float32) + tiebreak, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :num_encoded_tokens]

    # Re-binarize so exactly num_encoded_tokens are visible (rounding fixup,
    # model.py:229-233). take_along_axis is deliberate here — exempt from the
    # one-hot-matmul rule: the operand is a (B, N) int mask with NO feature
    # dim (each gathered element is one int32, ~0.8 MB total at the pretrain
    # config), so there is no 128-byte-lane waste to avoid, while the one-hot
    # form would build a (B, N, N) intermediate.
    mask_all = jnp.take_along_axis(
        jnp.ones_like(mask_all).at[:, :num_encoded_tokens].set(0),
        ids_restore, axis=1)
    import numpy as np

    splits = list(np.cumsum(np.asarray(num_tokens_per_task))[:-1])
    task_masks = jnp.split(mask_all, splits, axis=1)
    return list(task_masks), ids_keep, ids_restore


def masks_to_indices(task_masks: Dict[str, jax.Array], task_order: Sequence[str],
                     num_visible: int):
    """Explicit-mask path (model.py:378-382): derive shuffle/restore/keep
    indices from user-provided binary masks. `num_visible` must be static
    (it is: the wrapper computes it from which modalities are present)."""
    mask_all = jnp.concatenate([task_masks[t] for t in task_order], axis=1)
    ids_shuffle = jnp.argsort(mask_all, axis=1, stable=True)
    ids_restore = jnp.argsort(ids_shuffle, axis=1, stable=True)
    ids_keep = ids_shuffle[:, :num_visible]
    return ids_keep, ids_restore


def onehot_gather_rows(x: jax.Array, ids: jax.Array) -> jax.Array:
    """Row gather out[b, j] = x[b, ids[b, j]] as a one-hot matmul.

    On TPU a `take_along_axis` over the token axis degenerates to 128-byte
    gather traffic (measured 3.6 ms per decoder unshuffle at the pretraining
    shape vs ~0.1 ms for this form), and its backward becomes a scatter.
    Each output row has exactly one nonzero term, so the matmul is exact in
    any dtype. x: (B, N, D), ids: (B, M) -> (B, M, D)."""
    oh = jax.nn.one_hot(ids, x.shape[1], dtype=x.dtype)
    return jnp.einsum("bmn,bnd->bmd", oh, x)


def onehot_scatter_rows(values: jax.Array, ids: jax.Array, n: int,
                        fill: jax.Array) -> jax.Array:
    """Row scatter with fill: out[b, ids[b, j]] = values[b, j], every other
    row = fill. The one-hot form of the MultiMAE mask-token unshuffle
    (output_adapters.py:202-206): scattering the M visible tokens beats
    gathering all N rows through ids_restore — the one-hot is (B, M, N)
    instead of (B, N, N). values: (B, M, D), ids: (B, M),
    fill: broadcastable (..., D) -> (B, N, D)."""
    oh = jax.nn.one_hot(ids, n, dtype=values.dtype)  # (B, M, N)
    out = jnp.einsum("bmn,bmd->bnd", oh, values)
    covered = jnp.sum(oh, axis=1)[..., None]  # exactly 1.0 / 0.0
    return out + (1.0 - covered) * fill.astype(values.dtype)
