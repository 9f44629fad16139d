"""MIRAGE one-file public API (Hugging Face distribution flavor).

This module is deliberately SELF-CONTAINED — it mirrors the reference's
``hf/mirage_hf.py`` property of being a single dependency-light file
(reference: torch+einops; here: jax+numpy[+safetensors/huggingface_hub for
loading]). It duplicates the encoder-only forward path so downstream users
can vendor this file alone:

    from mirage_tpu.hf import MIRAGEWrapper
    model = MIRAGEWrapper.from_pretrained("j-morano/MIRAGE-Base")
    feats = model({"bscan": x, "slo": y})   # (B, N+1, D) token features

Weights load directly from the official ``j-morano/MIRAGE-{Base,Large}``
safetensors (the inner-model torch key namespace: input_adapters.*,
encoder.*, global_tokens) or from a local ``.pth``/``.safetensors`` file.

Parity: hf/mirage_hf.py:582-692 (MIRAGEWrapper), :363-579 (MIRAGELight),
hf/helper_hf.py:9-77 (from_pretrained).
"""

import functools
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


# ---------------------------------------------------------------- numerics

def build_2d_sincos_posemb(h: int, w: int, embed_dim: int, temperature: float = 1e4):
    """MoCo-v3 style (hf/mirage_hf.py:93-110). Returns (1, D, H, W) with the
    reference's exact layout quirk: meshgrid('ij') over (w, h) flattened and
    then reinterpreted as (h, w)."""
    assert embed_dim % 4 == 0
    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    pos = np.concatenate([np.sin(out_w), np.cos(out_w),
                          np.sin(out_h), np.cos(out_h)], axis=1)
    pos = pos.reshape(1, h, w, embed_dim).transpose(0, 3, 1, 2)
    return jnp.asarray(pos)


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(in_size: int, out_size: int, A: float = -0.75):
    """torch F.interpolate(bicubic, align_corners=False) row matrix."""
    W = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = scale * (dst + 0.5) - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0, ((A + 2) * x - (A + 3)) * x * x + 1,
            np.where(x < 2.0, (((A * x) - 5 * A) * x + 8 * A) * x - 4 * A, 0.0))

    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        np.add.at(W, (np.arange(out_size), idx), cubic(tap - t))
    return W.astype(np.float32)


def interpolate_posemb(pos, out_hw: Tuple[int, int]):
    """(1, D, H, W) -> (1, D, h, w), exact torch bicubic."""
    in_h, in_w = pos.shape[-2], pos.shape[-1]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return pos
    Wh = jnp.asarray(_bicubic_matrix(in_h, out_h))
    Ww = jnp.asarray(_bicubic_matrix(in_w, out_w))
    x = pos.astype(jnp.float32)
    x = jnp.einsum("oh,bdhw->bdow", Wh, x, precision="highest")
    x = jnp.einsum("pw,bdhw->bdhp", Ww, x, precision="highest")
    return x


def layer_norm(scale, bias, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def attention(p, x, num_heads):
    b, n, d = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv.reshape(b, n, 3, num_heads, d // num_heads), 3, axis=2)
    q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
    scale = (d // num_heads) ** -0.5
    attn = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
    return out @ p["proj_w"] + p["proj_b"]


def block(p, x, num_heads):
    h = layer_norm(p["n1_s"], p["n1_b"], x)
    x = x + attention(p, h, num_heads)
    h = layer_norm(p["n2_s"], p["n2_b"], x)
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + (h @ p["fc2_w"] + p["fc2_b"])


# ---------------------------------------------------------------- wrapper

class MIRAGEWrapper:
    """Encoder-only MIRAGE: multimodal tokens -> ViT -> (B, N+G, D) features."""

    SIZES = {"base": (768, 12, 12), "large": (1024, 24, 16)}

    def __init__(self, input_size=512, patch_size=32, modalities: str = "bscan-slo",
                 size: str = "base"):
        self.in_domains = modalities.split("-")
        self.input_size = _pair(input_size)
        self.patch_size = _pair(patch_size)
        self.grid_size = tuple(self.input_size[i] // self.patch_size[i]
                               for i in range(2))
        if size not in self.SIZES:
            raise ValueError(f"Unknown model size: {size}")
        self.size = size
        self.dim, self.depth, self.num_heads = self.SIZES[size]
        self.num_global_tokens = 1
        self.params: Optional[Dict[str, Any]] = None

    # -- weights ------------------------------------------------------------

    def load_state_dict(self, sd: Mapping[str, np.ndarray]):
        """Torch key namespace -> internal params. Accepts exactly the tensors
        the official safetensors carry; adapters/keys for absent modalities
        are ignored (strict=False semantics)."""
        sd = {k: np.asarray(v) for k, v in sd.items()}
        p: Dict[str, Any] = {"adapters": {}, "blocks": []}
        for dom in self.in_domains:
            pre = f"input_adapters.{dom}"
            w = sd[f"{pre}.proj.weight"]  # (D, C, ph, pw)
            p["adapters"][dom] = {
                "pos_emb": jnp.asarray(sd[f"{pre}.pos_emb"]),
                "w": jnp.asarray(w.reshape(w.shape[0], -1).T.copy()),
                "b": jnp.asarray(sd[f"{pre}.proj.bias"]),
            }
        for i in range(self.depth):
            pre = f"encoder.{i}"
            p["blocks"].append({
                "n1_s": jnp.asarray(sd[f"{pre}.norm1.weight"]),
                "n1_b": jnp.asarray(sd[f"{pre}.norm1.bias"]),
                "qkv_w": jnp.asarray(sd[f"{pre}.attn.qkv.weight"].T.copy()),
                "qkv_b": jnp.asarray(sd[f"{pre}.attn.qkv.bias"]),
                "proj_w": jnp.asarray(sd[f"{pre}.attn.proj.weight"].T.copy()),
                "proj_b": jnp.asarray(sd[f"{pre}.attn.proj.bias"]),
                "n2_s": jnp.asarray(sd[f"{pre}.norm2.weight"]),
                "n2_b": jnp.asarray(sd[f"{pre}.norm2.bias"]),
                "fc1_w": jnp.asarray(sd[f"{pre}.mlp.fc1.weight"].T.copy()),
                "fc1_b": jnp.asarray(sd[f"{pre}.mlp.fc1.bias"]),
                "fc2_w": jnp.asarray(sd[f"{pre}.mlp.fc2.weight"].T.copy()),
                "fc2_b": jnp.asarray(sd[f"{pre}.mlp.fc2.bias"]),
            })
        p["global_tokens"] = jnp.asarray(sd["global_tokens"])
        self.params = p
        return self

    @classmethod
    def from_pretrained(cls, name_or_path: str, **kwargs):
        """'j-morano/MIRAGE-{Base,Large}' (HF hub), a local safetensors/.pth
        file, or a local save_pretrained directory."""
        import os

        size = kwargs.pop("size", None)
        if size is None:
            size = "large" if "large" in str(name_or_path).lower() else "base"

        path = str(name_or_path)
        if os.path.isdir(path):
            path = os.path.join(path, "model.safetensors")
        elif not os.path.exists(path):
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(repo_id=path, filename="model.safetensors")

        if path.endswith(".pth"):
            import torch

            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            sd = {k: v.numpy() for k, v in ckpt.get("model", ckpt).items()}
        else:
            from safetensors.numpy import load_file

            sd = load_file(path)
        model = cls(size=size, **kwargs)
        return model.load_state_dict(sd)

    # -- forward ------------------------------------------------------------

    def _embed(self, params, dom, x):
        """(B, 1, H, W) -> (B, N, D): strided patchify as reshape+matmul
        (MXU-native) + interpolated sincos posemb."""
        b, c, h, w = x.shape
        ph, pw = self.patch_size
        nh, nw = h // ph, w // pw
        a = params["adapters"][dom]
        patches = x.reshape(b, c, nh, ph, nw, pw).transpose(0, 2, 4, 1, 3, 5)
        patches = patches.reshape(b, nh * nw, c * ph * pw)
        tokens = patches @ a["w"] + a["b"]
        pos = interpolate_posemb(a["pos_emb"], (nh, nw))
        pos = pos.reshape(1, self.dim, nh * nw).transpose(0, 2, 1)
        return tokens + pos.astype(tokens.dtype)

    def _forward(self, params, x: Dict[str, jax.Array]):
        tokens = [self._embed(params, dom, x[dom]) for dom in self.in_domains
                  if dom in x]
        tokens = jnp.concatenate(tokens, axis=1)
        b = tokens.shape[0]
        g = jnp.broadcast_to(params["global_tokens"].astype(tokens.dtype),
                             (b, self.num_global_tokens, self.dim))
        tokens = jnp.concatenate([tokens, g], axis=1)
        for bp in params["blocks"]:
            tokens = block(bp, tokens, self.num_heads)
        return tokens

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._forward)

    def __call__(self, x: Dict[str, Any]):
        """x: dict of (B, 1, H, W) float arrays in [0, 1].
        Returns (B, N+1, D) encoder token features."""
        assert self.params is not None, "call load_state_dict/from_pretrained first"
        x = {k: jnp.asarray(v) for k, v in x.items()}
        return self._jitted(self.params, x)
