"""Kernel-engaged pipeline parallelism (GPipe-style) via shard_map.

The reference has no distributed code (SURVEY.md §2.5); this completes the
designed TPU-native parallelism family (dp / ZeRO-FSDP / Megatron-TP /
TP×ZeRO) with the remaining classic axis: pipeline parallelism over the
encoder DEPTH. Strategy:

  - The stacked encoder parameters (leading layer axis, models/encoder.py)
    shard over a 'pipe' mesh axis: stage s owns layers
    [s·L/S, (s+1)·L/S) as a contiguous slice of every stacked leaf —
    pp_param_specs is just P('pipe') on axis 0. Adam moments shard the same
    way, so optimizer state is pipeline-sharded for free.
  - The forward is a GPipe schedule expressed as a lax.scan over
    T = M + S - 1 ticks (M microbatches, S stages): at each tick every
    stage runs its local layer stack (the SAME encoder_apply scan as the
    single-chip path — per-layer remat, Pallas kernels engaged, since
    inside shard_map every operand is device-local) and the activations
    rotate to the next stage with one ppermute. Stage 0 feeds microbatch
    t (clamped); the last stage collects finished microbatches into an
    output buffer; chains launched past t >= M never complete inside the
    scan, so the collected outputs are exactly the M valid chains.
  - The collected buffer is broadcast to every stage with a masked psum so
    the (small) decoder/loss tail runs replicated over 'pipe' — the same
    "replicate the cheap ends" choice as Megatron-TP's replicated
    activations; the encoder is where the FLOPs are.
  - Backward is pure autodiff: ppermute transposes to the inverse
    rotation, the masked psum transposes to a masked broadcast, and the
    bubble chains receive zero cotangents. No hand-written backward
    schedule.

Gradient bookkeeping (derived in train/steps._make_pp_train_step): with the
per-device loss scaled by 1/S, autodiff through the broadcast makes the
pipe-LOCAL encoder grads arrive complete (each stage's layers influence all
S replicated losses) while every other leaf's grad arrives as one S-th
(decoder-side leaves: consumed once per replica) or stage-0-only
(input-adapter-side leaves: consumed once, by the stage-0 feed) — both of
which a single psum('pipe') completes. pp_grad_kind encodes the split.

Bubble fraction is the standard GPipe (S-1)/(M+S-1); pick M ≥ 2·S where the
batch allows. Scope: drop_path must be statically 0.0 (per-layer rates are
a full-depth linspace the local stacks can't see; every reference
pretraining config uses 0.0) and the optimizer must not use layer_decay
(same full-depth-vector reason; the reference pretraining optimizer does
not — layer decay is a downstream-tuning feature, run_pretraining.py:504).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def is_pp(mesh: Mesh) -> bool:
    """Meshes the shard_map pipeline step covers: pipe > 1 with data any.
    Composition with fsdp/tensor sharding is not implemented — the step
    builder rejects those shapes."""
    return mesh.shape.get("pipe", 1) > 1


from mirage_tpu.parallel.tp import _names  # shared path-stringifier


def pp_param_specs(params, mesh: Mesh) -> Dict:
    """Pytree of PartitionSpec for the pipeline step: every stacked encoder
    leaf sharded over 'pipe' on its leading (layer) axis, everything else
    replicated. The encoder depth must be divisible by the pipe size."""
    del mesh

    def spec(path, leaf):
        if _names(path)[0] == "encoder" and getattr(leaf, "ndim", 0) >= 1:
            return P("pipe")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def pp_grad_kind(params) -> Dict:
    """How each leaf's gradient relates to the 'pipe' axis inside the
    pipeline step (with the 1/S loss scaling): 'local' (stage-sharded
    encoder leaves — complete as-is via the broadcast transpose) or 'sum'
    (everything else — one psum('pipe') completes it)."""

    def kind(path, leaf):
        if _names(path)[0] == "encoder" and getattr(leaf, "ndim", 0) >= 1:
            return "local"
        return "sum"

    return jax.tree_util.tree_map_with_path(kind, params)


def pp_encoder_apply(
    local_params,
    x,
    num_heads: int,
    *,
    axis: str,
    n_micro: int,
    total_depth: int,
    impl: str = "auto",
    drop: float = 0.0,
    attn_drop: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    grad_free: bool = False,
):
    """Pipelined encoder stack (see module docstring). `local_params` is the
    per-stage shard of the stacked encoder pytree (leading dim L/S inside
    shard_map); `x` is the full local-batch token tensor (B, N, D). Returns
    (tokens, None) like models/encoder.encoder_apply."""
    from mirage_tpu.models.encoder import encoder_apply

    local_depth = jax.tree_util.tree_leaves(local_params)[0].shape[0]
    assert total_depth % local_depth == 0, (
        f"encoder depth {total_depth} not a multiple of the local stack "
        f"{local_depth}")
    n_stages = total_depth // local_depth
    if n_stages == 1:
        # Degenerate single-stage view (pipe=1 mesh, or the model's pp flag
        # left on outside shard_map): the plain scan.
        return encoder_apply(
            local_params, x, num_heads, depth=local_depth, impl=impl,
            drop=drop, attn_drop=attn_drop, drop_path_rate=0.0,
            deterministic=deterministic, rng=rng, remat=remat,
            grad_free=grad_free)

    axis_size = jax.lax.psum(1, axis)  # static under shard_map
    assert axis_size == n_stages, (
        f"'{axis}' mesh axis has {axis_size} devices but the local stack "
        f"implies {n_stages} stages (depth {total_depth}/{local_depth})")
    b, n, d = x.shape
    assert b % n_micro == 0, (
        f"local batch {b} not divisible by n_micro {n_micro}")
    mb = b // n_micro
    s = jax.lax.axis_index(axis)
    x_mb = x.reshape(n_micro, mb, n, d)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_ticks = n_micro + n_stages - 1

    def tick(carry, t):
        act, out_buf = carry
        # stage 0 feeds microbatch t (clamped past the end: those chains
        # never reach a valid write slot before the scan ends)
        j = jnp.minimum(t, n_micro - 1)
        feed = jax.lax.dynamic_index_in_dim(x_mb, j, 0, keepdims=False)
        inp = jnp.where(s == 0, feed, act)
        r = None
        if rng is not None and not deterministic:
            # distinct dropout streams per (tick, stage); encoder_apply
            # splits per local layer internally
            r = jax.random.fold_in(jax.random.fold_in(rng, t), s)
        y, _ = encoder_apply(
            local_params, inp, num_heads, depth=local_depth, impl=impl,
            drop=drop, attn_drop=attn_drop, drop_path_rate=0.0,
            deterministic=deterministic, rng=r, remat=remat,
            grad_free=grad_free)
        # the last stage banks finished microbatch t-(S-1)
        w = t - (n_stages - 1)
        wj = jnp.clip(w, 0, n_micro - 1)
        old = jax.lax.dynamic_index_in_dim(out_buf, wj, 0, keepdims=False)
        write = (s == n_stages - 1) & (w >= 0)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(write, y, old), wj, 0)
        act = jax.lax.ppermute(y, axis, perm)
        return (act, out_buf), None

    carry0 = (jnp.zeros((mb, n, d), x.dtype), jnp.zeros_like(x_mb))
    (_, out_buf), _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
    # broadcast the last stage's buffer to every stage (transpose: the
    # replicated decoder/loss cotangents sum back into the last stage)
    out = jax.lax.psum(
        jnp.where(s == n_stages - 1, out_buf, jnp.zeros_like(out_buf)), axis)
    return out.reshape(b, n, d), None
