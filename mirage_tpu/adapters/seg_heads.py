"""Downstream segmentation heads (output adapters for MIRAGELight).

Parity targets in the reference:
  - Adapter base / adapt_tokens        mirage/output_adapters.py:299-322
  - SegmenterMaskTransformerAdapter    mirage/output_adapters.py:325-434
  - ConvNeXtAdapter                    mirage/output_adapters.py:437-517
  - LinearSegAdapter                   mirage/output_adapters.py:520-575
  - DPTOutputAdapter                   mirage/output_adapters.py:578-762
  - building blocks (ConvNeXtBlock, ResidualConvUnit, make_scratch,
    FeatureFusionBlock, Interpolate)   mirage/output_adapter_utils.py

Design: same functional convention as the rest of the package — frozen
dataclass configs with ``init_params(key, dim_tokens_enc)`` returning a plain
pytree and a pure ``__call__(params, encoder_tokens, input_info, ...)``.
Every head also provides ``params_from_torch(sd, prefix)`` so reference
fine-tuned checkpoints load directly (api/convert.py dispatches to it).

All spatial convs run through nn/conv.py (XLA convs -> MXU); the final
upsampling uses nn/resize.py for exact torch ``F.interpolate`` parity.
"""

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.nn import init as vinit
from mirage_tpu.nn.block import block_apply, block_init
from mirage_tpu.nn.conv import (
    batch_norm2d,
    batch_norm2d_init,
    conv2d,
    conv2d_init,
    conv2d_nhwc,
    conv_transpose2d,
    conv_transpose2d_init,
)
from mirage_tpu.nn.layers import drop_path, gelu, layer_norm, layer_norm_init, linear
from mirage_tpu.nn.resize import resize2d
from mirage_tpu.adapters.input_adapters import pair


def adapt_tokens(encoder_tokens, input_info, main_tasks: Sequence[str]):
    """Slice per-task token ranges and concat on the channel dim
    (output_adapters.py:313-322). Global tokens (at the end) fall away."""
    chunks = []
    for task in main_tasks:
        s = input_info["tasks"][task]["start_idx"]
        e = input_info["tasks"][task]["end_idx"]
        chunks.append(encoder_tokens[:, s:e])
    return jnp.concatenate(chunks, axis=-1)


# ---------------------------------------------------------------------------
# ConvNeXt block (output_adapter_utils.py:8-46)
# ---------------------------------------------------------------------------

def convnext_block_init(key, dim, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": conv2d_init(k1, dim, dim, 7, groups=dim, dtype=dtype),
        "norm": layer_norm_init(dim, dtype),
        # pwconvs are nn.Linear in the reference, hit by trunc_normal(.02)
        # via Adapter._init_weights (output_adapters.py:304-308)
        "pwconv1": {"w": vinit.trunc_normal(k2, (dim, 4 * dim), std=0.02, dtype=dtype),
                    "b": jnp.zeros((4 * dim,), dtype)},
        "pwconv2": {"w": vinit.trunc_normal(k3, (4 * dim, dim), std=0.02, dtype=dtype),
                    "b": jnp.zeros((dim,), dtype)},
    }


def convnext_block_apply(p, x, *, drop_path_rate=0.0, deterministic=True, rng=None):
    """x: (B, H, W, C) channels-last. Depthwise 7x7 -> LN -> MLP -> residual.

    The reference block is NCHW because torch convs are channels-first
    (output_adapter_utils.py:36-46, .permute()s around the LN/MLP). On TPU
    the LN + pointwise-matmul chain is channels-last native, and the round-3
    seg trace showed ~3 ms/step of pure NCHW<->NHWC copies around the
    fused-MLP custom calls — so the head carries NHWC end-to-end (the dwconv
    runs with NHWC dimension_numbers over the unchanged OIHW weights) and
    the transposes vanish. Same math; conv sums reassociate only."""
    inp = x
    dim = x.shape[-1]
    x = conv2d_nhwc(p["dwconv"], x, padding=3, groups=dim)
    from mirage_tpu.nn.attention import _on_tpu

    fused = ("gamma" not in p and _on_tpu()
             and (deterministic or (isinstance(drop_path_rate, (int, float))
                                    and drop_path_rate == 0.0)))
    if fused:
        # The post-dwconv chain IS the fused-MLP half-block shape
        # (LN -> fc1 -> GELU -> fc2) over B*H*W channel-last tokens; the
        # kernel (ops/fused_mlp.py, Pallas fwd + bwd) keeps the (.., 4C)
        # intermediates in VMEM — the XLA path ran the pointwise matmuls at
        # ~22% MFU behind NCHW<->NHWC layout thrash (seg trace, round 2).
        # The kernel adds its own residual of the dwconv output t, so
        # subtract t and add the block input (reference residual source,
        # output_adapter_utils.py:36-46); bf16 error of the subtract is one
        # ulp of t, at the same scale as the adds around it.
        from mirage_tpu.ops.fused_mlp import mlp_block

        b, h, w, c = x.shape
        t = x.reshape(b * h * w, c)
        out = mlp_block(t, p["norm"], {"fc1": p["pwconv1"], "fc2": p["pwconv2"]},
                        stash=True)
        mlp_out = (out - t).reshape(b, h, w, c)
        return inp + drop_path(mlp_out, drop_path_rate,
                               deterministic=deterministic, rng=rng)
    x = layer_norm(p["norm"], x)
    x = linear(p["pwconv1"], x)
    x = gelu(x)
    x = linear(p["pwconv2"], x)
    if "gamma" in p:
        x = p["gamma"].astype(x.dtype) * x
    return inp + drop_path(x, drop_path_rate, deterministic=deterministic, rng=rng)


def _convnext_block_from_torch(sd, pre):
    p = {
        "dwconv": {"w": jnp.asarray(sd[f"{pre}.dwconv.weight"]),
                   "b": jnp.asarray(sd[f"{pre}.dwconv.bias"])},
        "norm": {"scale": jnp.asarray(sd[f"{pre}.norm.weight"]),
                 "bias": jnp.asarray(sd[f"{pre}.norm.bias"])},
        "pwconv1": {"w": jnp.asarray(np.ascontiguousarray(sd[f"{pre}.pwconv1.weight"].T)),
                    "b": jnp.asarray(sd[f"{pre}.pwconv1.bias"])},
        "pwconv2": {"w": jnp.asarray(np.ascontiguousarray(sd[f"{pre}.pwconv2.weight"].T)),
                    "b": jnp.asarray(sd[f"{pre}.pwconv2.bias"])},
    }
    if f"{pre}.gamma" in sd:
        p["gamma"] = jnp.asarray(sd[f"{pre}.gamma"])
    return p


def _linear_from_torch(sd, pre):
    p = {"w": jnp.asarray(np.ascontiguousarray(sd[f"{pre}.weight"].T))}
    if f"{pre}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{pre}.bias"])
    return p


def _conv_from_torch(sd, pre):
    p = {"w": jnp.asarray(sd[f"{pre}.weight"])}
    if f"{pre}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{pre}.bias"])
    return p


def _ln_from_torch(sd, pre):
    return {"scale": jnp.asarray(sd[f"{pre}.weight"]),
            "bias": jnp.asarray(sd[f"{pre}.bias"])}


def _block_from_torch(sd, pre):
    return {
        "norm1": _ln_from_torch(sd, f"{pre}.norm1"),
        "attn": {"qkv": _linear_from_torch(sd, f"{pre}.attn.qkv"),
                 "proj": _linear_from_torch(sd, f"{pre}.attn.proj")},
        "norm2": _ln_from_torch(sd, f"{pre}.norm2"),
        "mlp": {"fc1": _linear_from_torch(sd, f"{pre}.mlp.fc1"),
                "fc2": _linear_from_torch(sd, f"{pre}.mlp.fc2")},
    }


# ---------------------------------------------------------------------------
# ConvNeXtAdapter (output_adapters.py:437-517)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvNeXtAdapter:
    num_classes: int
    embed_dim: int = 6144
    preds_per_patch: int = 16
    main_tasks: Tuple[str, ...] = ("bscan",)
    patch_size: Union[int, Tuple[int, int]] = 16
    depth: int = 4
    interpolate_mode: str = "bilinear"
    task: Optional[str] = None
    image_size: Optional[Tuple[int, int]] = None

    @property
    def class_dim(self):
        return self.embed_dim // self.preds_per_patch

    def init_params(self, key, dim_tokens_enc: int, dtype=jnp.float32):
        in_ch = dim_tokens_enc * len(self.main_tasks)
        keys = jax.random.split(key, self.depth + 2)
        return {
            "proj_dec": {"w": vinit.trunc_normal(keys[0], (in_ch, self.embed_dim),
                                                 std=0.02, dtype=dtype),
                         "b": jnp.zeros((self.embed_dim,), dtype)},
            "blocks": [convnext_block_init(keys[1 + i], self.class_dim, dtype)
                       for i in range(self.depth)],
            "final_layer": conv2d_init(keys[-1], self.class_dim, self.num_classes,
                                       1, dtype=dtype),
        }

    def __call__(self, params, encoder_tokens, input_info, *, deterministic=True,
                 rng=None, impl="auto"):
        task = self.task or self.main_tasks[0]
        h, w = self.image_size or input_info["tasks"][task]["image_size"]
        ph, pw = pair(self.patch_size)
        nh, nw = h // ph, w // pw
        sub = int(self.preds_per_patch ** 0.5)  # preds per patch side

        x = adapt_tokens(encoder_tokens, input_info, self.main_tasks)
        x = linear(params["proj_dec"], x)  # (B, N, embed_dim)
        b = x.shape[0]
        c = self.class_dim
        # (B, nh*nw, sub*sub*c) -> (B, nh*sub, nw*sub, c): tokens are already
        # channels-last, so the NHWC head needs no channel-first transpose
        # (reference builds NCHW here, output_adapters.py: rearrange to
        # b (c) (nh sub) (nw sub) — same spatial mapping, layout only)
        x = x.reshape(b, nh, nw, sub, sub, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * sub, nw * sub, c)
        for bp in params["blocks"]:
            x = convnext_block_apply(bp, x, deterministic=deterministic, rng=rng)
        # final 1x1 conv == channel matmul in NHWC (weight stays (O, I, 1, 1))
        fw = params["final_layer"]["w"]
        x = x @ fw[:, :, 0, 0].T.astype(x.dtype)
        if "b" in params["final_layer"]:  # bias optional, like conv2d
            x = x + params["final_layer"]["b"].astype(x.dtype)
        x = x.transpose(0, 3, 1, 2)  # (B, classes, H', W') — tiny at ncls chans
        return resize2d(x, (h, w), mode=self.interpolate_mode, align_corners=False)

    def params_from_torch(self, sd, pre):
        return {
            "proj_dec": _linear_from_torch(sd, f"{pre}.proj_dec"),
            "blocks": [_convnext_block_from_torch(sd, f"{pre}.blocks.{i}")
                       for i in range(self.depth)],
            "final_layer": _conv_from_torch(sd, f"{pre}.final_layer"),
        }


# ---------------------------------------------------------------------------
# LinearSegAdapter (output_adapters.py:520-575)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LinearSegAdapter:
    num_classes: int
    main_tasks: Tuple[str, ...] = ("bscan",)
    patch_size: Union[int, Tuple[int, int]] = 16
    interpolate_mode: str = "bilinear"
    task: Optional[str] = None
    image_size: Optional[Tuple[int, int]] = None

    def init_params(self, key, dim_tokens_enc: int, dtype=jnp.float32):
        return {"final_layer": conv2d_init(key, dim_tokens_enc, self.num_classes,
                                           1, dtype=dtype)}

    def __call__(self, params, encoder_tokens, input_info, *, deterministic=True,
                 rng=None, impl="auto"):
        task = self.task or self.main_tasks[0]
        h, w = self.image_size or input_info["tasks"][task]["image_size"]
        ph, pw = pair(self.patch_size)
        nh, nw = h // ph, w // pw
        x = adapt_tokens(encoder_tokens, input_info, self.main_tasks)
        b, _, d = x.shape
        x = x.reshape(b, nh, nw, d).transpose(0, 3, 1, 2)
        x = conv2d(params["final_layer"], x)
        return resize2d(x, (h, w), mode=self.interpolate_mode, align_corners=False)

    def params_from_torch(self, sd, pre):
        return {"final_layer": _conv_from_torch(sd, f"{pre}.final_layer")}


# ---------------------------------------------------------------------------
# SegmenterMaskTransformerAdapter (output_adapters.py:325-434)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SegmenterMaskTransformerAdapter:
    num_classes: int
    depth: int = 2
    num_heads: int = 12
    embed_dim: int = 768
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True
    main_tasks: Tuple[str, ...] = ("bscan",)
    patch_size: Union[int, Tuple[int, int]] = 16
    task: str = "semseg"
    image_size: Optional[Tuple[int, int]] = None

    def init_params(self, key, dim_tokens_enc: int, dtype=jnp.float32):
        in_ch = dim_tokens_enc * len(self.main_tasks)
        keys = jax.random.split(key, self.depth + 4)
        return {
            "cls_emb": vinit.trunc_normal(keys[0], (1, self.num_classes, self.embed_dim),
                                          std=0.02, dtype=dtype),
            "patch_proj": {"w": vinit.trunc_normal(keys[1], (self.embed_dim, self.embed_dim),
                                                   std=0.02, dtype=dtype)},
            "classes_proj": {"w": vinit.trunc_normal(keys[2], (self.embed_dim, self.embed_dim),
                                                     std=0.02, dtype=dtype)},
            "blocks": [block_init(keys[3 + i], self.embed_dim, mlp_ratio=self.mlp_ratio,
                                  qkv_bias=self.qkv_bias, dtype=dtype)
                       for i in range(self.depth)],
            "decoder_norm": layer_norm_init(self.embed_dim, dtype),
            "mask_norm": layer_norm_init(self.num_classes, dtype),
            "proj_dec": {"w": vinit.trunc_normal(keys[-1], (in_ch, self.embed_dim),
                                                 std=0.02, dtype=dtype),
                         "b": jnp.zeros((self.embed_dim,), dtype)},
        }

    def __call__(self, params, encoder_tokens, input_info, *, deterministic=True,
                 rng=None, impl="auto"):
        h, w = self.image_size or input_info["tasks"][self.task]["image_size"]
        ph, pw = pair(self.patch_size)
        nh, nw = h // ph, w // pw

        x = adapt_tokens(encoder_tokens, input_info, self.main_tasks)
        x = linear(params["proj_dec"], x)
        b = x.shape[0]
        cls_emb = jnp.broadcast_to(params["cls_emb"].astype(x.dtype),
                                   (b, self.num_classes, self.embed_dim))
        x = jnp.concatenate([x, cls_emb], axis=1)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i, bp in enumerate(params["blocks"]):
            r = jax.random.fold_in(rng, i) if rng is not None else None
            x = block_apply(bp, x, self.num_heads, impl=impl, drop=self.drop_rate,
                            attn_drop=self.attn_drop_rate, drop_path_rate=float(dpr[i]),
                            deterministic=deterministic, rng=r)
        x = layer_norm(params["decoder_norm"], x)

        patches = linear(params["patch_proj"], x[:, : -self.num_classes])
        cls_feat = linear(params["classes_proj"], x[:, -self.num_classes:])
        # F.normalize(p=2, dim=2) torch semantics: x / max(||x||, 1e-12)
        patches = patches / jnp.maximum(
            jnp.linalg.norm(patches.astype(jnp.float32), axis=2, keepdims=True),
            1e-12).astype(patches.dtype)
        cls_feat = cls_feat / jnp.maximum(
            jnp.linalg.norm(cls_feat.astype(jnp.float32), axis=2, keepdims=True),
            1e-12).astype(cls_feat.dtype)

        masks = patches @ cls_feat.transpose(0, 2, 1)  # (B, N, classes)
        masks = layer_norm(params["mask_norm"], masks)
        masks = masks.reshape(b, nh, nw, self.num_classes).transpose(0, 3, 1, 2)
        return resize2d(masks, (h, w), mode="bilinear", align_corners=False)

    def params_from_torch(self, sd, pre):
        return {
            "cls_emb": jnp.asarray(sd[f"{pre}.cls_emb"]),
            "patch_proj": _linear_from_torch(sd, f"{pre}.patch_proj"),
            "classes_proj": _linear_from_torch(sd, f"{pre}.classes_proj"),
            "blocks": [_block_from_torch(sd, f"{pre}.blocks.{i}")
                       for i in range(self.depth)],
            "decoder_norm": _ln_from_torch(sd, f"{pre}.decoder_norm"),
            "mask_norm": _ln_from_torch(sd, f"{pre}.mask_norm"),
            "proj_dec": _linear_from_torch(sd, f"{pre}.proj_dec"),
        }


# ---------------------------------------------------------------------------
# DPT (output_adapters.py:578-762 + output_adapter_utils.py:49-225)
# ---------------------------------------------------------------------------

def _rcu_init(key, features, use_bn, dtype):
    k1, k2 = jax.random.split(key)
    p = {
        "conv1": conv2d_init(k1, features, features, 3, bias=not use_bn, dtype=dtype),
        "conv2": conv2d_init(k2, features, features, 3, bias=not use_bn, dtype=dtype),
    }
    if use_bn:
        p["bn1"] = batch_norm2d_init(features, dtype)
        p["bn2"] = batch_norm2d_init(features, dtype)
    return p


def _rcu_apply(p, x, training=False):
    """ResidualConvUnit (output_adapter_utils.py:50-105): relu-conv[-bn] x2 + skip."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, padding=1)
    if "bn1" in p:
        out, _ = batch_norm2d(p["bn1"], out, training=training)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    if "bn2" in p:
        out, _ = batch_norm2d(p["bn2"], out, training=training)
    return out + x


def _rcu_from_torch(sd, pre):
    p = {"conv1": _conv_from_torch(sd, f"{pre}.conv1"),
         "conv2": _conv_from_torch(sd, f"{pre}.conv2")}
    for i in (1, 2):
        if f"{pre}.bn{i}.weight" in sd:
            p[f"bn{i}"] = {
                "scale": jnp.asarray(sd[f"{pre}.bn{i}.weight"]),
                "bias": jnp.asarray(sd[f"{pre}.bn{i}.bias"]),
                "mean": jnp.asarray(sd[f"{pre}.bn{i}.running_mean"]),
                "var": jnp.asarray(sd[f"{pre}.bn{i}.running_var"]),
            }
    return p


def _fusion_init(key, features, use_bn, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resConfUnit1": _rcu_init(k1, features, use_bn, dtype),
        "resConfUnit2": _rcu_init(k2, features, use_bn, dtype),
        "out_conv": conv2d_init(k3, features, features, 1, dtype=dtype),
    }


def _fusion_apply(p, x, res=None, training=False):
    """FeatureFusionBlock (output_adapter_utils.py:166-225): optional skip RCU,
    RCU, 2x bilinear (align_corners=True), 1x1 out conv."""
    out = x
    if res is not None:
        out = out + _rcu_apply(p["resConfUnit1"], res, training)
    out = _rcu_apply(p["resConfUnit2"], out, training)
    out = resize2d(out, (out.shape[-2] * 2, out.shape[-1] * 2),
                   mode="bilinear", align_corners=True)
    return conv2d(p["out_conv"], out)


def _fusion_from_torch(sd, pre):
    return {
        "resConfUnit1": _rcu_from_torch(sd, f"{pre}.resConfUnit1"),
        "resConfUnit2": _rcu_from_torch(sd, f"{pre}.resConfUnit2"),
        "out_conv": _conv_from_torch(sd, f"{pre}.out_conv"),
    }


@dataclasses.dataclass(frozen=True)
class DPTOutputAdapter:
    num_classes: int = 3
    stride_level: int = 1
    patch_size: Union[int, Tuple[int, int]] = 16
    main_tasks: Tuple[str, ...] = ("bscan",)
    hooks: Tuple[int, ...] = (2, 5, 8, 11)
    layer_dims: Tuple[int, ...] = (96, 192, 384, 768)
    feature_dim: int = 256
    use_bn: bool = False
    head_type: str = "semseg"
    task: str = "semseg"
    image_size: Optional[Tuple[int, int]] = None

    @property
    def patch_hw(self):
        ph, pw = pair(self.patch_size)
        return max(1, ph // self.stride_level), max(1, pw // self.stride_level)

    def init_params(self, key, dim_tokens_enc: int, dtype=jnp.float32):
        in_ch = dim_tokens_enc * len(self.main_tasks)
        keys = jax.random.split(key, 20)
        f = self.feature_dim
        # Reassemble stages (output_adapters.py:672-726): 1x1 proj then
        # 4x up / 2x up / identity / 2x down.
        act = [
            {"proj": conv2d_init(keys[0], in_ch, self.layer_dims[0], 1, dtype=dtype),
             "resample": conv_transpose2d_init(keys[1], self.layer_dims[0],
                                               self.layer_dims[0], 4, dtype=dtype)},
            {"proj": conv2d_init(keys[2], in_ch, self.layer_dims[1], 1, dtype=dtype),
             "resample": conv_transpose2d_init(keys[3], self.layer_dims[1],
                                               self.layer_dims[1], 2, dtype=dtype)},
            {"proj": conv2d_init(keys[4], in_ch, self.layer_dims[2], 1, dtype=dtype)},
            {"proj": conv2d_init(keys[5], in_ch, self.layer_dims[3], 1, dtype=dtype),
             "resample": conv2d_init(keys[6], self.layer_dims[3],
                                     self.layer_dims[3], 3, dtype=dtype)},
        ]
        p = {
            "act_postprocess": act,
            "layer_rn": [conv2d_init(keys[7 + i], self.layer_dims[i], f, 3,
                                     bias=False, dtype=dtype) for i in range(4)],
            "refinenet": [_fusion_init(keys[11 + i], f, self.use_bn, dtype)
                          for i in range(4)],
        }
        if self.head_type == "semseg":
            head = {"conv1": conv2d_init(keys[15], f, f, 3, bias=False, dtype=dtype),
                    "conv2": conv2d_init(keys[16], f, self.num_classes, 1, dtype=dtype)}
            if self.use_bn:
                head["bn"] = batch_norm2d_init(f, dtype)
        elif self.head_type == "regression":
            head = {"conv1": conv2d_init(keys[15], f, f // 2, 3, dtype=dtype),
                    "conv2": conv2d_init(keys[16], f // 2, 32, 3, dtype=dtype),
                    "conv3": conv2d_init(keys[17], 32, self.num_classes, 1, dtype=dtype)}
        else:
            raise ValueError('DPT head_type must be "regression" or "semseg".')
        p["head"] = head
        return p

    def __call__(self, params, encoder_tokens, input_info, *, deterministic=True,
                 rng=None, impl="auto", training=False):
        """encoder_tokens: list of per-layer (B, N+G, D) arrays
        (MIRAGELight forward with return_all_layers=True)."""
        h, w = self.image_size or input_info["tasks"][self.task]["image_size"]
        ph, pw = self.patch_hw
        nh = h // (self.stride_level * ph)
        nw = w // (self.stride_level * pw)

        layers = [adapt_tokens(encoder_tokens[k], input_info, self.main_tasks)
                  for k in self.hooks]
        layers = [l.reshape(l.shape[0], nh, nw, l.shape[-1]).transpose(0, 3, 1, 2)
                  for l in layers]

        # Reassemble to 4 scales
        act = params["act_postprocess"]
        l0 = conv_transpose2d(act[0]["resample"], conv2d(act[0]["proj"], layers[0]),
                              stride=4)
        l1 = conv_transpose2d(act[1]["resample"], conv2d(act[1]["proj"], layers[1]),
                              stride=2)
        l2 = conv2d(act[2]["proj"], layers[2])
        l3 = conv2d(act[3]["resample"], conv2d(act[3]["proj"], layers[3]),
                    stride=2, padding=1)
        layers = [l0, l1, l2, l3]
        layers = [conv2d(params["layer_rn"][i], l, padding=1)
                  for i, l in enumerate(layers)]

        rn = params["refinenet"]
        path = _fusion_apply(rn[3], layers[3], training=training)
        path = _fusion_apply(rn[2], path, layers[2], training=training)
        path = _fusion_apply(rn[1], path, layers[1], training=training)
        path = _fusion_apply(rn[0], path, layers[0], training=training)

        hp = params["head"]
        if self.head_type == "semseg":
            out = conv2d(hp["conv1"], path, padding=1)
            if "bn" in hp:
                out, _ = batch_norm2d(hp["bn"], out, training=training)
            out = jax.nn.relu(out)
            # Dropout(0.1) sits here in the reference; p=0.1 train-only.
            if not deterministic and rng is not None:
                keep = 0.9
                mask = jax.random.bernoulli(rng, keep, out.shape)
                out = jnp.where(mask, out / keep, 0.0).astype(out.dtype)
            out = conv2d(hp["conv2"], out)
            out = resize2d(out, (out.shape[-2] * 2, out.shape[-1] * 2),
                           mode="bilinear", align_corners=True)
        else:
            out = conv2d(hp["conv1"], path, padding=1)
            out = resize2d(out, (out.shape[-2] * 2, out.shape[-1] * 2),
                           mode="bilinear", align_corners=True)
            out = jax.nn.relu(conv2d(hp["conv2"], out, padding=1))
            out = conv2d(hp["conv3"], out)
        return out

    def params_from_torch(self, sd, pre):
        act = []
        for i in range(4):
            stage = {"proj": _conv_from_torch(sd, f"{pre}.act_postprocess.{i}.0")}
            if f"{pre}.act_postprocess.{i}.1.weight" in sd:
                stage["resample"] = _conv_from_torch(sd, f"{pre}.act_postprocess.{i}.1")
            act.append(stage)
        p = {
            "act_postprocess": act,
            "layer_rn": [_conv_from_torch(sd, f"{pre}.scratch.layer{i + 1}_rn")
                         for i in range(4)],
            "refinenet": [_fusion_from_torch(sd, f"{pre}.scratch.refinenet{i + 1}")
                          for i in range(4)],
        }
        if self.head_type == "semseg":
            head = {"conv1": _conv_from_torch(sd, f"{pre}.head.0"),
                    "conv2": _conv_from_torch(sd, f"{pre}.head.4")}
            if f"{pre}.head.1.weight" in sd:
                head["bn"] = {
                    "scale": jnp.asarray(sd[f"{pre}.head.1.weight"]),
                    "bias": jnp.asarray(sd[f"{pre}.head.1.bias"]),
                    "mean": jnp.asarray(sd[f"{pre}.head.1.running_mean"]),
                    "var": jnp.asarray(sd[f"{pre}.head.1.running_var"]),
                }
        else:
            head = {"conv1": _conv_from_torch(sd, f"{pre}.head.0"),
                    "conv2": _conv_from_torch(sd, f"{pre}.head.2"),
                    "conv3": _conv_from_torch(sd, f"{pre}.head.4")}
        p["head"] = head
        return p
