"""Device mesh + sharding specs: the distributed backend.

The reference has no distributed code (SURVEY.md §2.5) — this is the designed
TPU-native equivalent. Strategy (scaling-book recipe):
  - 3-axis mesh ('data', 'fsdp', 'tensor') over ICI; unused axes size 1.
  - Batch is sharded over ('data', 'fsdp') — fsdp acts as zero-style sharded
    data parallelism; gradients all-reduce over both axes (XLA emits psum
    from the sharding specs, no hand-written collectives).
  - Encoder parameters (the bulk of FLOPs/bytes) are sharded: attention
    qkv/mlp-in over ('fsdp' x 'tensor') on (in, out) dims, proj/mlp-out
    transposed — the classic Megatron pattern, expressed purely via
    NamedSharding so XLA places all-reduces after row-parallel matmuls.
  - Adapters/heads/norms are replicated (tiny).
Multi-host: the same specs work over DCN-connected hosts via
jax.make_array_from_process_local_data in the input pipeline (data/).
"""

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """axes e.g. {'data': 2, 'fsdp': 2, 'tensor': 2}. Defaults to pure data
    parallelism over all devices. An optional 'pipe' axis (pipeline
    parallelism over the encoder depth, parallel/pp.py) is added as a 4th —
    innermost, so pipeline neighbors are ICI-adjacent — dimension only when
    requested, keeping every 3-axis mesh byte-identical to before."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices), "fsdp": 1, "tensor": 1}
    names = ["data", "fsdp", "tensor"] + (["pipe"] if "pipe" in axes else [])
    for name in names:
        axes.setdefault(name, 1)
    n = int(np.prod([axes[nm] for nm in names]))
    assert n == len(devices), f"mesh {axes} != {len(devices)} devices"
    arr = np.asarray(devices).reshape([axes[nm] for nm in names])
    return Mesh(arr, axis_names=tuple(names))


def batch_spec() -> P:
    """Batch dim sharded over data+fsdp (leading axis of every input)."""
    return P(("data", "fsdp"))


def _encoder_spec(names, leaf) -> P:
    """Partition specs for stacked encoder leaves (leading layer axis)."""
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if parent == "qkv" and leaf_name == "w":      # (L, D, 3D)
        return P(None, "fsdp", "tensor")
    if parent == "qkv" and leaf_name == "b":      # (L, 3D)
        return P(None, "tensor")
    if parent == "proj" and leaf_name == "w":     # (L, D, D) row-parallel
        return P(None, "tensor", "fsdp")
    if parent == "fc1" and leaf_name == "w":      # (L, D, 4D)
        return P(None, "fsdp", "tensor")
    if parent == "fc1" and leaf_name == "b":
        return P(None, "tensor")
    if parent == "fc2" and leaf_name == "w":      # (L, 4D, D)
        return P(None, "tensor", "fsdp")
    return P()  # norms, small biases: replicated


def param_specs(params) -> Dict:
    """Pytree of PartitionSpec matching `params`."""

    def spec(path, leaf):
        names = [str(p.key) if isinstance(p, jax.tree_util.DictKey) else str(getattr(p, "idx", p))
                 for p in path]
        if names and names[0] == "encoder":
            return _encoder_spec(names, leaf)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def global_batch_from_local(mesh: Mesh, local_batch):
    """Multi-host (DCN) input glue: each host feeds its process-local shard of
    the global batch (loaded via DataLoader's shard_index/num_shards) and this
    assembles the logically-global sharded arrays (SURVEY.md §2.5: per-host
    dataset sharding + make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, batch_spec())

    def make(x):
        sh = NamedSharding(
            mesh, P(("data", "fsdp"), *([None] * (np.ndim(x) - 1))))
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(make, local_batch)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to param_specs."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh (data-parallel params)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def is_dp_only(mesh: Mesh) -> bool:
    """True when the mesh shards nothing but the batch (fsdp=tensor=pipe=1)."""
    return (mesh.shape.get("fsdp", 1) == 1
            and mesh.shape.get("tensor", 1) == 1
            and mesh.shape.get("pipe", 1) == 1)


def is_fsdp_only(mesh: Mesh) -> bool:
    """True for (data, fsdp) meshes with no tensor parallelism — the shape
    the shard_map FSDP train step covers (kernels engaged; tensor>1 keeps
    GSPMD + attn_impl='xla', since in-kernel LN/matmuls can't span a sharded
    feature dim without cross-device reductions the kernels don't do)."""
    return (mesh.shape.get("fsdp", 1) > 1
            and mesh.shape.get("tensor", 1) == 1
            and mesh.shape.get("pipe", 1) == 1)


# Leaves smaller than this stay replicated under FSDP: norms/biases/posembs
# are noise next to the stacked matmul weights, and gathering them per step
# costs more dispatch than their memory is worth.
_FSDP_MIN_ELEMS = 1 << 17


def _fsdp_leaf_spec(leaf, fsdp: int) -> P:
    """ZeRO-style spec for one leaf: shard the LAST axis over 'fsdp' when the
    leaf is big enough and divisible; otherwise replicate. The last axis is
    never the stacked layer axis (encoder leaves lead with L), so layer-decay
    lr vectors still broadcast over sharded leaves."""
    if leaf.ndim < 2 or int(np.prod(leaf.shape)) < _FSDP_MIN_ELEMS:
        return P()
    if leaf.shape[-1] % fsdp != 0:
        return P()
    return P(*([None] * (leaf.ndim - 1) + ["fsdp"]))


def fsdp_param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpec for the shard_map FSDP step: every big matmul
    weight (and its Adam moments) sharded over 'fsdp' on its last axis,
    small leaves replicated. Distinct from `param_specs` (the Megatron
    GSPMD layout): here every device gathers FULL weights before compute —
    the sharding is a storage layout, chosen so the gathered result is
    bit-identical to the unsharded array."""
    fsdp = mesh.shape.get("fsdp", 1)
    return jax.tree_util.tree_map(lambda l: _fsdp_leaf_spec(l, fsdp), params)


def fsdp_gather(tree, specs):
    """all_gather every 'fsdp'-sharded leaf back to full shape (tiled).
    Differentiable: the transpose is psum_scatter, so grads of gathered
    params arrive reduce-scattered (summed over the fsdp axis, shard-shaped)
    — the ZeRO gradient flow, for free from autodiff. Must run inside a
    shard_map over an 'fsdp' axis."""

    def g(x, sp):
        if not sp or "fsdp" not in sp:
            return x
        ax = sp.index("fsdp")
        return jax.lax.all_gather(x, "fsdp", axis=ax, tiled=True)

    return jax.tree_util.tree_map(g, tree, specs)


def dp_shard_map(fn, mesh: Mesh, *, n_batch_args: int, n_scalar_args: int = 0,
                 axes=("data", "fsdp")):
    """Data-parallel shard_map wrapper for a kernel-bearing computation.

    ``fn(params, *batches, *scalars)`` runs per-device on the local batch
    shard with params REPLICATED. This — not GSPMD — is how the Pallas
    kernels compose with a mesh: a ``pallas_call`` whose operands carry
    NamedShardings under plain ``jit`` is a hard Mosaic error ("cannot be
    automatically partitioned. Please wrap the call in a shard_map"), so
    every multi-device path that wants the fused kernels engaged must be
    manually partitioned. Inside shard_map each program is a single-device
    trace: the kernels launch on purely local operands, exactly as on one
    chip. Batch args shard over ('data','fsdp'); outputs are batch-sharded.

    Used by the wrapper's mesh serving and the data-parallel train step
    (train/steps.py). GSPMD-sharded (fsdp/tensor) training instead builds
    the model with attn_impl='xla' (see ops/runtime.py docstring).
    """
    from jax import shard_map

    in_specs = ((P(),) + (P(axes),) * n_batch_args + (P(),) * n_scalar_args)
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P(axes),
                     check_vma=False)
