"""PyTorch MIRAGE checkpoint <-> JAX param-pytree conversion.

Key namespace of the reference checkpoints (SURVEY.md §2.2):
  input_adapters.{task}.{pos_emb,proj.weight,proj.bias,class_emb.weight}
  encoder.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.{weight,bias}
  output_adapters.{task}.{mask_token,task_embeddings.{t},pos_emb,
      proj_context,decoder.{q,kv,proj},context_norm,query_norm,out_norm,
      mlp.{fc1,fc2},decoder_transformer.{i}.*,out_proj}
  global_tokens

Layout transforms:
  - torch Linear (out, in) -> ours (in, out): transpose
  - torch Conv2d patch proj (D, C, ph, pw) -> ours (C*ph*pw, D):
    reshape(D, -1).T  (row order (c, ph, pw) matches ops.patch_embed.patchify)
  - torch LayerNorm weight/bias -> scale/bias
  - encoder layers i=0..L-1 -> stacked leaves with leading layer axis
"""

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from mirage_tpu.adapters.input_adapters import SemSegInputAdapter
from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `.pth` checkpoint -> {'model': {key: np.ndarray},
    'args': dict, ...}. Requires torch (CPU) at import time only here."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {}
    state = ckpt.get("model", ckpt)
    out["model"] = {k: v.detach().cpu().numpy() for k, v in state.items()}
    if "args" in ckpt:
        args = ckpt["args"]
        out["args"] = vars(args) if not isinstance(args, dict) else args
    for k in ("epoch", "scaler"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


# ---------------------------------------------------------------------------


def _t(x):
    return jnp.asarray(np.ascontiguousarray(x.T))


def _a(x):
    return jnp.asarray(x)


def _linear(sd, prefix):
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _a(sd[f"{prefix}.bias"])
    return p


def _conv_as_linear(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (D, C, ph, pw)
    p = {"w": _t(w.reshape(w.shape[0], -1))}
    if f"{prefix}.bias" in sd:
        p["b"] = _a(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _a(sd[f"{prefix}.weight"]), "bias": _a(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {"qkv": _linear(sd, f"{prefix}.qkv"), "proj": _linear(sd, f"{prefix}.proj")}


def _xattn(sd, prefix):
    return {
        "q": _linear(sd, f"{prefix}.q"),
        "kv": _linear(sd, f"{prefix}.kv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }


def _mlp(sd, prefix):
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _encoder_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": _attn(sd, f"{prefix}.attn"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _stack(blocks):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def torch_to_params(sd: Mapping[str, np.ndarray], model) -> Dict[str, Any]:
    """Convert a torch state_dict (numpy values) into the param pytree of
    `model` (a mirage_tpu MIRAGEModel)."""
    params: Dict[str, Any] = {}

    # Input adapters
    params["input_adapters"] = {}
    for task, adapter in model.input_adapters.items():
        pre = f"input_adapters.{task}"
        p: Dict[str, Any] = {"pos_emb": _a(sd[f"{pre}.pos_emb"])}
        if isinstance(adapter, SemSegInputAdapter):
            p["class_emb"] = _a(sd[f"{pre}.class_emb.weight"])
            if adapter.interpolate_class_emb:
                p["proj"] = _conv_as_linear(sd, f"{pre}.proj.1")
            else:
                p["proj"] = _conv_as_linear(sd, f"{pre}.proj")
        else:
            p["proj"] = _conv_as_linear(sd, f"{pre}.proj")
        params["input_adapters"][task] = p

    # Encoder
    depth = model.depth
    params["encoder"] = _stack(
        [_encoder_block(sd, f"encoder.{i}") for i in range(depth)])

    params["global_tokens"] = _a(sd["global_tokens"])

    # Output adapters
    if model.output_adapters is not None:
        params["output_adapters"] = {}
        for task, adapter in model.output_adapters.items():
            pre = f"output_adapters.{task}"
            if isinstance(adapter, SpatialOutputAdapter):
                p = {
                    "mask_token": _a(sd[f"{pre}.mask_token"]),
                    "pos_emb": _a(sd[f"{pre}.pos_emb"]),
                    "proj_context": _linear(sd, f"{pre}.proj_context"),
                    "out_proj": _linear(sd, f"{pre}.out_proj"),
                }
                te_keys = [k for k in sd if k.startswith(f"{pre}.task_embeddings.")]
                if te_keys:
                    p["task_embeddings"] = {
                        k.rsplit(".", 1)[-1]: _a(sd[k]) for k in te_keys
                    }
                if adapter.use_xattn:
                    p["decoder"] = _xattn(sd, f"{pre}.decoder")
                    p["context_norm"] = _ln(sd, f"{pre}.context_norm")
                    p["query_norm"] = _ln(sd, f"{pre}.query_norm")
                    p["out_norm"] = _ln(sd, f"{pre}.out_norm")
                    p["mlp"] = _mlp(sd, f"{pre}.mlp")
                if adapter.depth > 0:
                    p["decoder_transformer"] = [
                        _encoder_block(sd, f"{pre}.decoder_transformer.{i}")
                        for i in range(adapter.depth)
                    ]
                params["output_adapters"][task] = p
            else:
                # Downstream seg heads implement their own from_torch
                params["output_adapters"][task] = adapter.params_from_torch(sd, pre)

    return params


def overlay_torch_params(init_params: Dict[str, Any], sd: Mapping[str, np.ndarray],
                         model) -> Dict[str, Any]:
    """strict=False loading: convert whatever keys exist in `sd` and overlay
    them onto freshly-initialized params (warm starts from MultiMAE-B / MAE-L
    checkpoints that lack our adapters, run_pretraining.py:429-446)."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, init_params)  # fresh containers

    blocks = []
    try:
        for i in range(model.depth):
            blocks.append(_encoder_block(sd, f"encoder.{i}"))
        params["encoder"] = _stack(blocks)
    except KeyError:
        pass

    if "global_tokens" in sd:
        params["global_tokens"] = _a(sd["global_tokens"])

    for task, adapter in model.input_adapters.items():
        pre = f"input_adapters.{task}"
        try:
            p: Dict[str, Any] = {"pos_emb": _a(sd[f"{pre}.pos_emb"])}
            if isinstance(adapter, SemSegInputAdapter):
                p["class_emb"] = _a(sd[f"{pre}.class_emb.weight"])
                proj_key = f"{pre}.proj.1" if adapter.interpolate_class_emb else f"{pre}.proj"
                p["proj"] = _conv_as_linear(sd, proj_key)
            else:
                p["proj"] = _conv_as_linear(sd, f"{pre}.proj")
            params["input_adapters"][task] = p
        except KeyError:
            continue
    return params


def params_to_torch(params: Mapping[str, Any], model) -> Dict[str, np.ndarray]:
    """Inverse mapping, for exporting checkpoints loadable by the reference."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_conv(prefix, p, shape_chw):
        w = np.asarray(p["w"]).T  # (D, C*ph*pw)
        sd[f"{prefix}.weight"] = w.reshape(w.shape[0], *shape_chw)
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_block(prefix, p):
        put_ln(f"{prefix}.norm1", p["norm1"])
        put_linear(f"{prefix}.attn.qkv", p["attn"]["qkv"])
        put_linear(f"{prefix}.attn.proj", p["attn"]["proj"])
        put_ln(f"{prefix}.norm2", p["norm2"])
        put_linear(f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
        put_linear(f"{prefix}.mlp.fc2", p["mlp"]["fc2"])

    for task, adapter in model.input_adapters.items():
        pre = f"input_adapters.{task}"
        p = params["input_adapters"][task]
        sd[f"{pre}.pos_emb"] = np.asarray(p["pos_emb"])
        ph, pw = adapter.patch_hw
        if isinstance(adapter, SemSegInputAdapter):
            sd[f"{pre}.class_emb.weight"] = np.asarray(p["class_emb"])
            c = adapter.dim_class_emb
            if adapter.interpolate_class_emb:
                put_conv(f"{pre}.proj.1", p["proj"], (c, 1, 1))
            else:
                put_conv(f"{pre}.proj", p["proj"], (c, ph, pw))
        else:
            put_conv(f"{pre}.proj", p["proj"], (adapter.num_channels, ph, pw))

    import jax

    for i in range(model.depth):
        put_block(f"encoder.{i}", jax.tree_util.tree_map(lambda x: x[i], params["encoder"]))

    sd["global_tokens"] = np.asarray(params["global_tokens"])

    if model.output_adapters is not None:
        for task, adapter in model.output_adapters.items():
            pre = f"output_adapters.{task}"
            p = params["output_adapters"][task]
            if not isinstance(adapter, SpatialOutputAdapter):
                continue
            sd[f"{pre}.mask_token"] = np.asarray(p["mask_token"])
            sd[f"{pre}.pos_emb"] = np.asarray(p["pos_emb"])
            put_linear(f"{pre}.proj_context", p["proj_context"])
            put_linear(f"{pre}.out_proj", p["out_proj"])
            for t, v in p.get("task_embeddings", {}).items():
                sd[f"{pre}.task_embeddings.{t}"] = np.asarray(v)
            if adapter.use_xattn:
                put_linear(f"{pre}.decoder.q", p["decoder"]["q"])
                put_linear(f"{pre}.decoder.kv", p["decoder"]["kv"])
                put_linear(f"{pre}.decoder.proj", p["decoder"]["proj"])
                put_ln(f"{pre}.context_norm", p["context_norm"])
                put_ln(f"{pre}.query_norm", p["query_norm"])
                put_ln(f"{pre}.out_norm", p["out_norm"])
                put_linear(f"{pre}.mlp.fc1", p["mlp"]["fc1"])
                put_linear(f"{pre}.mlp.fc2", p["mlp"]["fc2"])
            for i in range(adapter.depth):
                put_block(f"{pre}.decoder_transformer.{i}", p["decoder_transformer"][i])
    return sd


def interpolate_pos_embed_sd(sd: Dict[str, np.ndarray], model) -> Dict[str, np.ndarray]:
    """Bicubic-resize ``input_adapters.*.pos_emb`` entries to the model's
    posemb grids (mutils/pos_embed.py:7-23; enables 512-pretrain ->
    1024-finetune). Exact torch F.interpolate(bicubic, align_corners=False)
    semantics via the nn/resize matrices."""
    from mirage_tpu.nn.resize import _resize_matrix

    out = dict(sd)
    pattern = re.compile(r"input_adapters\.(.*)\.pos_emb$")
    for key in list(out.keys()):
        m = pattern.match(key)
        if not m:
            continue
        domain = m.group(1)
        adapter = model.input_adapters.get(domain)
        if adapter is None:
            continue
        new_h, new_w = adapter.posemb_grid
        arr = np.asarray(out[key], dtype=np.float32)
        orig_h, orig_w = arr.shape[-2], arr.shape[-1]
        if (orig_h, orig_w) == (new_h, new_w):
            continue
        wh = _resize_matrix(orig_h, new_h, "bicubic", False)
        ww = _resize_matrix(orig_w, new_w, "bicubic", False)
        arr = np.einsum("oh,bdhw->bdow", wh, arr)
        arr = np.einsum("pw,bdhw->bdhp", ww, arr)
        out[key] = arr
    return out


def interpolate_vit_pos_embed(arr, new_grid: int, num_prefix_tokens: int = 1):
    """Bicubic-resize a timm-style learned pos_embed (1, P + G*G, D) to a new
    square grid, keeping prefix (cls) tokens (mutils/pos_embed analog for the
    baseline ViTs; torch F.interpolate bicubic align_corners=False semantics)."""
    from mirage_tpu.nn.resize import _resize_matrix

    arr = np.asarray(arr, dtype=np.float32)
    prefix, patch = arr[:, :num_prefix_tokens], arr[:, num_prefix_tokens:]
    orig = int(round(patch.shape[1] ** 0.5))
    if orig * orig != patch.shape[1]:
        raise ValueError(f"pos_embed patch count {patch.shape[1]} not square")
    if orig == new_grid:
        return arr
    d = patch.shape[-1]
    grid = patch.reshape(1, orig, orig, d)
    wh = _resize_matrix(orig, new_grid, "bicubic", False)
    ww = _resize_matrix(orig, new_grid, "bicubic", False)
    grid = np.einsum("oh,bhwd->bowd", wh, grid)
    grid = np.einsum("pw,bhwd->bhpd", ww, grid)
    return np.concatenate([prefix, grid.reshape(1, new_grid * new_grid, d)],
                          axis=1)


def seg_checkpoint_surgery(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pretrain-checkpoint -> seg-tuning surgery (fm_seg_config.py:87-104):
    rename bscanlayermap->semseg, pad the semseg class embedding by one row
    (the downstream padding index), drop output adapters."""
    out = {}
    for k, v in sd.items():
        if "output_adapters" in k:
            continue
        out[k.replace("bscanlayermap", "semseg")] = v
    key = "input_adapters.semseg.class_emb.weight"
    if key in out:
        emb = np.asarray(out[key])
        out[key] = np.concatenate([emb, np.zeros((1, emb.shape[1]), emb.dtype)], axis=0)
    return out


def rename_keys(sd: Mapping[str, np.ndarray], mapping: Mapping[str, str]):
    """Bulk key rename (e.g. 'bscanlayermap' -> 'semseg', fm_seg_config.py:90-94,
    or MAE 'blocks.' -> 'encoder.', run_pretraining.py:432-436)."""
    out = {}
    for k, v in sd.items():
        nk = k
        for old, new in mapping.items():
            nk = re.sub(old, new, nk)
        out[nk] = v
    return out
