"""Modality input adapters: image -> token sequences.

Parity targets:
  - PatchedInputAdapter (mirage/input_adapters.py:12-110): strided patch
    embed + bicubic-interpolated 2D sin-cos posemb.
  - SemSegInputAdapter (mirage/input_adapters.py:113-238): class-embedding
    lookup + patch projection + bilinear-interpolated posemb, optional
    padding index and interpolate_class_emb variant.

TPU-native: the patch conv is a reshape+matmul (see ops/patch_embed.py) and
posemb interpolation is a pair of small matmuls with torch semantics
(nn/resize.py). Adapters are dataclass configs with init/apply pure fns —
the two-phase ``init(dim_tokens)`` protocol of the reference collapses into
constructor + ``init_params``.
"""

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mirage_tpu.nn import init as vinit
from mirage_tpu.nn.posemb import build_2d_sincos_posemb
from mirage_tpu.nn.resize import resize2d
from mirage_tpu.ops.patch_embed import patch_embed


def pair(t):
    if t is None:
        return None
    if isinstance(t, (tuple, list)):
        return tuple(t)
    return (t, t)


@dataclasses.dataclass(frozen=True)
class PatchedInputAdapter:
    num_channels: int
    stride_level: int = 1
    patch_size_full: Union[int, Tuple[int, int]] = 16
    sincos_pos_emb: bool = True
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    dim_tokens: Optional[int] = None  # set by the model

    @property
    def patch_hw(self):
        ph, pw = pair(self.patch_size_full)
        return max(1, ph // self.stride_level), max(1, pw // self.stride_level)

    @property
    def posemb_grid(self):
        h, w = pair(self.image_size)
        ph, pw = self.patch_hw
        return h // (self.stride_level * ph), w // (self.stride_level * pw)

    @property
    def num_patches(self):
        h, w = pair(self.image_size)
        ph, pw = pair(self.patch_size_full)
        return (h // ph) * (w // pw)

    def init_params(self, key, dim_tokens: int, dtype=jnp.float32):
        ph, pw = self.patch_hw
        hp, wp = self.posemb_grid
        k_pos, k_proj = jax.random.split(key)
        if self.sincos_pos_emb:
            pos = build_2d_sincos_posemb(hp, wp, dim_tokens).astype(dtype)
        else:
            pos = vinit.trunc_normal(k_pos, (1, dim_tokens, hp, wp), std=0.02, dtype=dtype)
        # MAE-style init: conv proj initialized as a linear (model.py:106-110)
        fan = self.num_channels * ph * pw
        w = vinit.xavier_uniform(k_proj, (fan, dim_tokens), fan_in=fan, fan_out=dim_tokens, dtype=dtype)
        # torch conv bias init: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound = 1.0 / (fan ** 0.5)
        b = jax.random.uniform(jax.random.fold_in(k_proj, 1), (dim_tokens,), dtype, -bound, bound)
        return {"pos_emb": pos, "proj": {"w": w, "b": b}}

    def num_tokens(self, input_hw: Tuple[int, int]):
        ph, pw = self.patch_hw
        return (input_hw[0] // ph) * (input_hw[1] // pw)

    def __call__(self, params, x, compute_dtype=None):
        """x: (B, C, H, W) -> (B, N, D)."""
        _, _, h, w = x.shape
        ph, pw = self.patch_hw
        assert h % ph == 0 and w % pw == 0, f"{h}x{w} not divisible by patch {ph}x{pw}"
        nh, nw = h // ph, w // pw
        pos = resize2d(params["pos_emb"], (nh, nw), mode="bicubic", align_corners=False)
        d = pos.shape[1]
        pos_tokens = pos.reshape(1, d, nh * nw).transpose(0, 2, 1)
        return patch_embed(x, params["proj"]["w"], params["proj"]["b"], ph, pw,
                           pos_emb_tokens=pos_tokens, compute_dtype=compute_dtype)


@dataclasses.dataclass(frozen=True)
class SemSegInputAdapter:
    num_classes: int
    stride_level: int = 1
    patch_size_full: Union[int, Tuple[int, int]] = 16
    sincos_pos_emb: bool = True
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    dim_class_emb: int = 64
    interpolate_class_emb: bool = False
    emb_padding_idx: Optional[int] = None
    dim_tokens: Optional[int] = None

    @property
    def effective_num_classes(self):
        # Reference bumps num_classes by 1 when a padding index is used
        # (input_adapters.py:157-158).
        return self.num_classes + (1 if self.emb_padding_idx is not None else 0)

    @property
    def patch_hw(self):
        ph, pw = pair(self.patch_size_full)
        return max(1, ph // self.stride_level), max(1, pw // self.stride_level)

    @property
    def posemb_grid(self):
        h, w = pair(self.image_size)
        ph, pw = self.patch_hw
        return h // (self.stride_level * ph), w // (self.stride_level * pw)

    def init_params(self, key, dim_tokens: int, dtype=jnp.float32):
        ph, pw = self.patch_hw
        hp, wp = self.posemb_grid
        k_pos, k_emb, k_proj = jax.random.split(key, 3)
        if self.sincos_pos_emb:
            pos = build_2d_sincos_posemb(hp, wp, dim_tokens).astype(dtype)
        else:
            pos = vinit.trunc_normal(k_pos, (1, dim_tokens, hp, wp), std=0.02, dtype=dtype)
        class_emb = vinit.trunc_normal(
            k_emb, (self.effective_num_classes, self.dim_class_emb), std=0.02, dtype=dtype)
        if self.emb_padding_idx is not None:
            class_emb = class_emb.at[self.emb_padding_idx].set(0.0)
        if self.interpolate_class_emb:
            fan = self.dim_class_emb  # 1x1 conv
            w = vinit.xavier_uniform(k_proj, (fan, dim_tokens), dtype=dtype)
        else:
            fan = self.dim_class_emb * ph * pw
            w = vinit.xavier_uniform(k_proj, (fan, dim_tokens), fan_in=fan,
                                     fan_out=dim_tokens, dtype=dtype)
        bound = 1.0 / (fan ** 0.5)
        b = jax.random.uniform(jax.random.fold_in(k_proj, 1), (dim_tokens,), dtype, -bound, bound)
        return {"pos_emb": pos, "class_emb": class_emb, "proj": {"w": w, "b": b}}

    def num_tokens(self, input_hw: Tuple[int, int]):
        ph, pw = self.patch_hw
        return (input_hw[0] // ph) * (input_hw[1] // pw)

    def __call__(self, params, x, compute_dtype=None):
        """x: (B, H, W) int labels -> (B, N, D)."""
        _, h, w = x.shape
        ph, pw = self.patch_hw
        assert h % ph == 0 and w % pw == 0, f"{h}x{w} not divisible by patch {ph}x{pw}"
        nh, nw = h // ph, w // pw
        # Class-embedding lookup as a one-hot matmul: (B, H, W) -> (B, H, W,
        # C_emb). A row gather (jnp.take) degenerates to 128-byte scatter/
        # gather traffic on TPU — measured 7.2 ms fwd + 28.2 ms bwd (the dW
        # scatter) per pretraining step at 256x128x128; the one-hot product
        # is numerically identical (single 1.0 per row) and runs in ~1 ms
        # each way on the MXU.
        cdtype = compute_dtype or params["class_emb"].dtype
        if self.interpolate_class_emb:
            onehot = jax.nn.one_hot(x, params["class_emb"].shape[0], dtype=cdtype)
            emb = onehot @ params["class_emb"].astype(cdtype)
            emb_nchw = emb.transpose(0, 3, 1, 2)
            # Bilinear downsample by (1/ph, 1/pw) then 1x1 conv
            # (input_adapters.py:194-200). torch Upsample(scale_factor) floors.
            emb_small = resize2d(emb_nchw, (h // ph, w // pw), mode="bilinear",
                                 align_corners=False)
            tokens = patch_embed(emb_small, params["proj"]["w"], params["proj"]["b"],
                                 1, 1, compute_dtype=compute_dtype)
        else:
            # Folded path: class-emb lookup ∘ patch projection collapses into
            # ONE one-hot matmul. token = Σ_{pos,c} E[label_pos, c]·W[c·P+pos]
            # = Σ_pos M[pos·K + label_pos] with M[p·K+k] = Σ_c E[k,c]·W[c·P+p].
            # vs the two-step (emb lookup -> NCHW transpose -> patchify ->
            # (B·N, C_emb·P) @ W): contracts over K=13 classes instead of
            # C_emb·P=4096 channels (83.8 vs 412 GFLOP/step at the pretrain
            # config) and kills the four ~1.7 ms (B,64,128,128) layout copies
            # the round-3 trace showed around the old patchify. M is folded
            # in f32 at call time (one (P,K,C)x(C,D) einsum, ~0.3 GFLOP).
            k = params["class_emb"].shape[0]
            p = ph * pw
            d = params["proj"]["w"].shape[-1]
            w_pcd = params["proj"]["w"].astype(jnp.float32).reshape(
                self.dim_class_emb, p, d)
            m = jnp.einsum("kc,cpd->pkd", params["class_emb"].astype(jnp.float32),
                           w_pcd).reshape(p * k, d).astype(cdtype)
            # labels -> (B, N, P) patch-major ints; the per-position one-hot
            # reshaped to (B, N, P*K) is exactly the disjoint multi-hot
            # selecting M[p*K + label_p] for every position
            labels = x.reshape(x.shape[0], nh, ph, nw, pw)
            labels = labels.transpose(0, 1, 3, 2, 4).reshape(x.shape[0], nh * nw, p)
            onehot = jax.nn.one_hot(labels, k, dtype=cdtype).reshape(
                x.shape[0], nh * nw, p * k)
            tokens = onehot @ m + params["proj"]["b"].astype(cdtype)
        pos = resize2d(params["pos_emb"], (nh, nw), mode="bilinear", align_corners=False)
        d = pos.shape[1]
        pos_tokens = pos.reshape(1, d, nh * nw).transpose(0, 2, 1)
        return tokens + pos_tokens.astype(tokens.dtype)
