"""Checkpointing: orbax pytree checkpoints with auto-resume, best-model
tracking, and safetensors/HF + reference-.pth interop.

Capability parity: mutils/checkpoint.py — ``save_model`` writes
``checkpoint-{epoch|best}`` containing model/optimizer/epoch/args (:9-32);
``auto_load_model`` globs the latest and restores training state (:35-86).
Cross-format: hf/helper_hf.py safetensors push/load; torch_to_params /
params_to_torch in api/convert.py handle the .pth key namespace.

TPU-native: checkpoints are sharding-aware pytrees (orbax restores shards
directly to their devices on a mesh); metadata (epoch/args) rides alongside
as JSON. No pickle, no torch dependency on the save path.
"""

import glob
import json
import os
import re
from typing import Optional

import jax
import numpy as np


def _ckpt_dir(output_dir: str, tag) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{tag}")


def state_to_host(state):
    """Fetch a train state to host numpy regardless of its placement.

    Single-process (and fully-replicated multi-process dp) states are a
    plain device_get. Model-sharded states on MULTI-PROCESS meshes (the
    ZeRO-FSDP / Megatron-TP shard_map layouts) span non-addressable
    devices, where device_get raises — those leaves are gathered with the
    collective-backed jax.experimental.multihost_utils.process_allgather
    (every process receives the full value, so the single-writer save
    stays valid)."""
    if jax.process_count() == 1:
        return jax.device_get(state)
    from jax.experimental import multihost_utils

    def fetch(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable \
                or x.is_fully_replicated:
            return jax.device_get(x)
        # tiled=True is REQUIRED for global non-fully-addressable arrays
        # (and ignored in spirit: the result is the fully-replicated value,
        # not a concat — multihost_utils raises on tiled=False here)
        return multihost_utils.process_allgather(x, tiled=True)

    return jax.tree_util.tree_map(fetch, state)


def save_checkpoint(output_dir: str, state, epoch, *, args: Optional[dict] = None,
                    tag=None, keep_every: int = 0):
    """Write ``{output_dir}/checkpoint-{epoch}`` (or ``-best`` etc. via tag).

    state: arbitrary pytree (train state: params/opt/step). args: JSON-able
    run configuration stored next to the arrays.
    """
    import orbax.checkpoint as ocp

    tag = epoch if tag is None else tag
    path = _ckpt_dir(output_dir, tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": int(epoch)}
    if args is not None:
        meta["args"] = {k: v for k, v in args.items()
                        if isinstance(v, (int, float, str, bool, list, dict, type(None)))}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if keep_every:
        prune_checkpoints(output_dir, keep_every)
    return path


def prune_checkpoints(output_dir: str, keep_every: int):
    """Keep only every ``keep_every``-th epoch checkpoint plus the latest and
    'best' (the reference keeps all; this bounds disk on long runs)."""
    epochs = sorted(
        int(m.group(1)) for d in glob.glob(_ckpt_dir(output_dir, "*"))
        if (m := re.search(r"checkpoint-(\d+)$", d)))
    for e in epochs[:-1]:
        if e % keep_every != 0:
            import shutil

            shutil.rmtree(_ckpt_dir(output_dir, e), ignore_errors=True)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    candidates = []
    for d in glob.glob(_ckpt_dir(output_dir, "*")):
        m = re.search(r"checkpoint-(\d+)$", d)
        if m:
            candidates.append((int(m.group(1)), d))
    if not candidates:
        return None
    return max(candidates)[1]


def _reconcile_opt_moments(restored, template):
    """Align optimizer moment layouts across freeze-flag changes: frozen
    leaves hold scalar placeholder moments (optim.py init), so a checkpoint
    saved with different frozen_paths/freeze_encoder has full-size moments
    where the template expects scalars (collapse: the leaf is frozen now, its
    moments are dead) or scalars where the template expects full-size (expand
    to zeros: a freshly-unfrozen leaf starts with empty moments, exactly as
    the reference does when handing it to the optimizer for the first time)."""
    def fix(r, t):
        if np.shape(r) == t.shape:
            return r
        if t.ndim == 0:
            return np.zeros((), np.asarray(r).dtype)
        if np.ndim(r) == 0:
            return np.zeros(t.shape, t.dtype)
        raise ValueError(
            f"moment shape mismatch beyond freeze-layout: {np.shape(r)} vs "
            f"{t.shape}")

    # params must match exactly — only the moment layout may drift
    jax.tree_util.tree_map(
        lambda r, t: (_ for _ in ()).throw(ValueError(
            f"param shape mismatch: {np.shape(r)} vs {t.shape}"))
        if np.shape(r) != t.shape else r,
        restored["params"], template["params"])
    out = dict(restored)
    out["opt"] = dict(restored["opt"])
    for k in ("mu", "nu"):
        if k in out["opt"] and k in template.get("opt", {}):
            out["opt"][k] = jax.tree_util.tree_map(
                fix, out["opt"][k], template["opt"][k])
    return out


def load_checkpoint(path: str, state_template, *, partial: bool = False):
    """Restore a checkpoint into the structure (and shardings) of
    ``state_template``. Returns (state, meta_dict). partial=True restores a
    sub-pytree (e.g. params only, ignoring optimizer state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
    if partial:
        # restore everything (structure from the checkpoint's own metadata),
        # then slice the requested subtree — orbax's StandardRestore has no
        # partial mode in this version
        full = ckptr.restore(path)
        state = {k: full[k] for k in state_template}
    else:
        try:
            state = ckptr.restore(path, abstract)
        except Exception as e:
            # moment-layout drift (frozen-leaf scalar placeholders vs
            # full-size buffers) surfaces as a shape/structure mismatch;
            # anything else (corrupt checkpoint, IO, dtype corruption) is
            # NOT maskable by a raw-restore retry — re-raise it unmasked
            msg = str(e).lower()
            if not any(s in msg for s in ("shape", "struct", "mismatch",
                                          "tree", "not compatible")):
                raise
            raw = ckptr.restore(path)
            if not (isinstance(raw, dict) and isinstance(state_template, dict)
                    and {"params", "opt"} <= raw.keys()
                    and {"params", "opt"} <= state_template.keys()):
                raise ValueError(
                    f"checkpoint at {path} does not have the params/opt "
                    f"train-state structure") from e
            state = _reconcile_opt_moments(raw, state_template)
            # the raw restore ignores the template's shardings/dtypes —
            # re-apply them (the abstract restore would have)
            def _place(r, t):
                r = np.asarray(r).astype(t.dtype) if hasattr(t, "dtype") else r
                sharding = getattr(t, "sharding", None)
                return jax.device_put(r, sharding) if sharding is not None else r
            state = jax.tree_util.tree_map(_place, state, state_template)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def auto_load_checkpoint(output_dir: str, state_template):
    """Resume from the newest ``checkpoint-N`` under output_dir, if any
    (mutils/checkpoint.py:44-57). Returns (state, start_epoch) or
    (state_template, 0)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return state_template, 0
    state, meta = load_checkpoint(path, state_template)
    return state, int(meta.get("epoch", -1)) + 1


def load_best_checkpoint(output_dir: str, state_template):
    path = _ckpt_dir(output_dir, "best")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    return load_checkpoint(path, state_template)[0]


# ---------------------------------------------------------------------------
# safetensors / HF interop (hf/helper_hf.py:9-77)
# ---------------------------------------------------------------------------

def save_safetensors(params, model, path: str, config: Optional[dict] = None):
    """Export params as a reference-key-namespace safetensors file (+ HF-style
    config.json) loadable by both this package and the PyTorch reference."""
    from safetensors.numpy import save_file

    from mirage_tpu.api.convert import params_to_torch

    sd = {k: np.asarray(v) for k, v in params_to_torch(params, model).items()}
    save_file(sd, path)
    if config is not None:
        with open(os.path.join(os.path.dirname(path) or ".", "config.json"), "w") as f:
            json.dump(config, f)
    return path


def resolve_pretrained(name_or_path: str) -> str:
    """Resolve an HF repo id ('j-morano/MIRAGE-Base') or local path to a local
    weights file (.safetensors or .pth). Hub download is attempted only when
    the path does not exist locally (offline environments use local files)."""
    if os.path.exists(name_or_path):
        if os.path.isdir(name_or_path):
            # only flat weight FILES: consumers (MIRAGEWrapper, load_safetensors)
            # can't read an orbax 'checkpoint-best' directory — those go
            # through load_checkpoint/export_safetensors instead
            for fname in ("model.safetensors", "model.pth"):
                c = os.path.join(name_or_path, fname)
                if os.path.isfile(c):
                    return c
            raise FileNotFoundError(
                f"No weights file under {name_or_path} (orbax checkpoint dirs "
                "must be exported to safetensors first, see cli/hf_push.py)")
        return name_or_path
    try:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(repo_id=name_or_path, filename="model.safetensors")
    except Exception as e:  # zero-egress or missing repo
        raise FileNotFoundError(
            f"{name_or_path} is neither a local path nor a reachable HF repo: {e}")
