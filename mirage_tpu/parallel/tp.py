"""Kernel-engaged tensor parallelism (Megatron-style) via shard_map.

The reference has no tensor parallelism (single-GPU training,
run_pretraining.py); this is the designed TPU-native equivalent for models
whose optimizer state outgrows FSDP alone. Strategy:

  - Activations stay REPLICATED over the 'tensor' mesh axis between encoder
    blocks (the classic Megatron layout). Each block's two branches are
    computed shard-locally: attention is HEAD-parallel (each device owns
    H/t heads end-to-end: its qkv columns, its score/PV matmuls, its proj
    rows), the MLP is HIDDEN-parallel (fc1 columns / fc2 rows). One psum
    per branch completes the row-parallel matmul.
  - Because the whole thing runs inside shard_map, every operand the Pallas
    kernels see is device-local — the Mosaic "cannot be automatically
    partitioned" restriction never applies, so the fused attention
    (ops/block_attention.block_attention) and the no-residual fused MLP
    (ops/fused_mlp.mlp_block(residual=False)) stay ENGAGED, unlike the
    GSPMD tensor path which must build the model with attn_impl='xla'
    (measured 25-33% slower per chip, BASELINE.md round 5).
  - Gradient flow uses the Megatron f/g conjugate pair (ident_f / psum_g
    below): f is identity forward / psum backward (the branch reads of the
    replicated activation sum their cotangents across shards), g is psum
    forward / identity backward (downstream cotangents are replicated).
    With those two, autodiff produces shard-local weight grads for the
    sharded leaves and complete, shard-identical grads everywhere else —
    except the in-block LayerNorm scales/biases, whose grads arrive as
    per-shard partials (each shard only differentiates its own branch) and
    are psum'd by the train step (tp_grad_kind marks them 'partial').

Storage layout: plain slicing of the last/first weight axes works for
proj/fc1/fc2 (contiguous chunks of heads resp. hidden units), but the fused
qkv weight's output axis is ordered [3, H, dh] (q|k|v outermost,
nn/attention.py reshape semantics) — a contiguous chunk would mix thirds of
q with thirds of k. tp_relayout permutes that axis to [t, 3, H/t, dh]
(head-group-major) once at placement, so the 'tensor' shard of the
relayouted array IS a standard-layout local qkv weight for H/t heads.
Adam moments use the same permutation (elementwise state follows its
param); tp_unrelayout inverts it for checkpoint export.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


# ---------------------------------------------------------------------------
# Megatron f/g conjugate collectives
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_g(x, axis: str):
    """Megatron 'g': all-reduce forward, identity backward. Placed after a
    row-parallel matmul (proj / fc2) whose per-shard outputs are partial
    sums; the downstream cotangent is replicated across the axis, so the
    true per-shard cotangent is exactly it."""
    return jax.lax.psum(x, axis)


def _psum_g_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _psum_g_bwd(axis, _, g):
    return (g,)


psum_g.defvjp(_psum_g_fwd, _psum_g_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ident_f(x, axis: str):
    """Megatron 'f': identity forward, all-reduce backward. Placed where a
    replicated activation fans out into shard-local branches: each shard's
    autodiff only sees its own branch's contribution to dx, and the psum
    restores the full sum so everything upstream receives complete,
    shard-identical cotangents."""
    return x


def _ident_f_fwd(x, axis):
    return x, None


def _ident_f_bwd(axis, _, g):
    return (jax.lax.psum(g, axis),)


ident_f.defvjp(_ident_f_fwd, _ident_f_bwd)


# ---------------------------------------------------------------------------
# Mesh predicates / specs
# ---------------------------------------------------------------------------

def is_tp_only(mesh: Mesh) -> bool:
    """Meshes the shard_map TP step covers: tensor > 1, fsdp == 1 (data
    any). tensor>1 WITH fsdp>1 takes the composed TP×ZeRO step
    (_make_tp_fsdp_train_step) instead — see is_tp_fsdp."""
    return (mesh.shape.get("tensor", 1) > 1
            and mesh.shape.get("fsdp", 1) == 1
            and mesh.shape.get("pipe", 1) == 1)


def is_tp_fsdp(mesh: Mesh) -> bool:
    """Meshes the composed TP×ZeRO shard_map step covers: tensor > 1 AND
    fsdp > 1 (data any). Encoder weights shard over BOTH axes (tensor on
    the Megatron branch axis, fsdp on the orthogonal one — tp_fsdp_specs);
    big non-encoder leaves ZeRO-shard over 'fsdp' on their last axis; the
    step all_gathers the fsdp axis per step and runs the TP block compute,
    kernels engaged."""
    return (mesh.shape.get("tensor", 1) > 1
            and mesh.shape.get("fsdp", 1) > 1
            and mesh.shape.get("pipe", 1) == 1)


def _names(path):
    return [str(p.key) if isinstance(p, jax.tree_util.DictKey)
            else str(getattr(p, "idx", p)) for p in path]


def _tp_leaf_spec(names) -> P:
    """Partition spec for one leaf under the shard_map TP layout. Encoder
    leaves have a leading stacked-layer axis (models/encoder.py)."""
    if not names or names[0] != "encoder":
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    leaf = names[-1]
    if parent == "qkv" and leaf == "w":       # (L, D, 3D) head-group-major
        return P(None, None, "tensor")
    if parent == "qkv" and leaf == "b":       # (L, 3D)
        return P(None, "tensor")
    if parent == "proj" and leaf == "w":      # (L, D, D): head rows
        return P(None, "tensor", None)
    if parent == "fc1" and leaf == "w":       # (L, D, 4D): hidden cols
        return P(None, None, "tensor")
    if parent == "fc1" and leaf == "b":       # (L, 4D)
        return P(None, "tensor")
    if parent == "fc2" and leaf == "w":       # (L, 4D, D): hidden rows
        return P(None, "tensor", None)
    return P()  # norms + proj/fc2 biases (added after the psum): replicated


def tp_param_specs(params, mesh: Mesh) -> Dict:
    """Pytree of PartitionSpec for the shard_map TP step (placement of the
    tp_relayout'ed params and their Adam moments)."""
    del mesh
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _tp_leaf_spec(_names(path)), params)


def tp_fsdp_specs(params, mesh: Mesh) -> Dict:
    """Partition specs composing the Megatron tensor sharding with
    ZeRO-style fsdp sharding (for tensor>1 AND fsdp>1 meshes):

      - tensor-sharded WEIGHTS additionally shard their orthogonal matmul
        axis over 'fsdp' (qkv/fc1: the D input axis; proj/fc2: the D
        output axis) when divisible — the step gathers 'fsdp' back before
        compute (storage-only, like the plain ZeRO step), so the gathered
        local leaf is exactly the TP step's shard;
      - tensor-sharded BIASES have no free axis — they stay fsdp-replicated;
      - everything else takes the plain ZeRO last-axis rule
        (parallel/mesh._fsdp_leaf_spec: big + divisible leaves only).
    """
    from mirage_tpu.parallel.mesh import _fsdp_leaf_spec

    fsdp = mesh.shape.get("fsdp", 1)

    def spec(path, leaf):
        names = _names(path)
        tsp = _tp_leaf_spec(names)
        if tsp == P():
            return _fsdp_leaf_spec(leaf, fsdp)
        if getattr(leaf, "ndim", 0) != len(tsp):
            return tsp  # scalar moment placeholders etc.
        parts = list(tsp)
        # the free (non-layer, non-tensor) axis — present only on 3-D
        # weight leaves; 2-D biases have none
        free = [i for i in range(1, len(parts)) if parts[i] is None]
        if free and leaf.shape[free[0]] % fsdp == 0:
            parts[free[0]] = "fsdp"
        return P(*parts)

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_grad_kind(params) -> Dict:
    """How each leaf's gradient relates to the 'tensor' axis inside the TP
    step: 'local' (sharded leaf, shard-complete), 'partial' (in-block
    LayerNorm params — each shard differentiates only its own branch, psum
    needed), 'replicated' (complete and identical on every shard)."""

    def kind(path, _):
        names = _names(path)
        sp = _tp_leaf_spec(names)
        if sp != P():
            return "local"
        if names and names[0] == "encoder" and any(
                n in ("norm1", "norm2") for n in names):
            return "partial"
        return "replicated"

    return jax.tree_util.tree_map_with_path(kind, params)


# ---------------------------------------------------------------------------
# qkv head-group-major relayout
# ---------------------------------------------------------------------------

def _qkv_perm(leaf, num_heads: int, t: int, invert: bool):
    """Permute the trailing [3, H, dh] axis to [t, 3, H/t, dh] (or back)."""
    three_d = leaf.shape[-1]
    d_attn = three_d // 3
    dh = d_attn // num_heads
    lead = leaf.shape[:-1]
    if invert:
        x = leaf.reshape(*lead, t, 3, num_heads // t, dh)
        x = jnp.moveaxis(x, -4, -3)          # (..., 3, t, H/t, dh)
    else:
        x = leaf.reshape(*lead, 3, t, num_heads // t, dh)
        x = jnp.moveaxis(x, -3, -4)          # (..., t, 3, H/t, dh)
    return x.reshape(*lead, three_d)


def _relayout_tree(tree, num_heads: int, t: int, invert: bool):
    def one(path, leaf):
        names = _names(path)
        if (names and names[0] == "encoder" and len(names) >= 2
                and names[-2] == "qkv" and getattr(leaf, "ndim", 0) >= 1):
            return _qkv_perm(leaf, num_heads, t, invert)
        return leaf

    return jax.tree_util.tree_map_with_path(one, tree)


def tp_relayout(params, num_heads: int, t: int):
    """Head-group-major permutation of the encoder's fused-qkv leaves so a
    contiguous 'tensor' shard of the last axis is a standard-layout local
    qkv weight. Pure permutation (bit-exact inverse: tp_unrelayout). Also
    applied to Adam moments (elementwise state follows its param)."""
    assert num_heads % t == 0, f"num_heads {num_heads} % tensor {t} != 0"
    return _relayout_tree(params, num_heads, t, invert=False)


def tp_unrelayout(params, num_heads: int, t: int):
    """Inverse of tp_relayout (for checkpoint export / interop)."""
    return _relayout_tree(params, num_heads, t, invert=True)


def tp_relayout_state(state, num_heads: int, t: int, invert: bool = False):
    """Apply the qkv permutation to a whole train state: params and the
    elementwise Adam moments (mu/nu) transform together; counters/steps and
    any other opt entries pass through. invert=True for checkpoint export
    (the single place the standard<->head-group-major mapping is defined
    for states — shard_state, the pretraining CLI's save path, and the AOT
    export checks all go through here)."""
    fn = tp_unrelayout if invert else tp_relayout
    return {
        "params": fn(state["params"], num_heads, t),
        "opt": {k: (fn(v, num_heads, t) if k in ("mu", "nu") else v)
                for k, v in state["opt"].items()},
        "step": state["step"],
    }
