"""Plain ViT classifiers (baseline models for the cls benchmark).

Parity: mutils/vit.py — timm-style ViT (cls token + learned pos-emb,
patch 16) with three pooling strategies: 'global' (mean of patch tokens),
'cls' (cls token), 'token_mix' (cls + patch mean, 2x head). Used only as
non-MIRAGE baselines in the classification benchmark.

Checkpoint interop uses timm key names (cls_token, pos_embed,
patch_embed.proj.{weight,bias}, blocks.{i}.*, norm.*, head.*).
"""

import dataclasses
import jax
import jax.numpy as jnp

from mirage_tpu.models.encoder import encoder_apply, encoder_init
from mirage_tpu.nn import init as vinit
from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear
from mirage_tpu.ops.patch_embed import patch_embed
from mirage_tpu.utils.factory import get_factory_adder

add_vit, vit_factory = get_factory_adder()


@dataclasses.dataclass(frozen=True)
class VisionTransformer:
    num_classes: int
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pool: str = "cls"  # 'global' | 'cls' | 'token_mix'
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def grid(self):
        return self.img_size // self.patch_size

    @property
    def num_patches(self):
        return self.grid * self.grid

    def init_params(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 5)
        d = self.embed_dim
        fan = self.in_chans * self.patch_size ** 2
        head_in = d * (2 if self.pool == "token_mix" else 1)
        bound = 1.0 / (head_in ** 0.5)
        return {
            "cls_token": jnp.zeros((1, 1, d), dtype),
            "pos_embed": vinit.trunc_normal(keys[0], (1, self.num_patches + 1, d),
                                            std=0.02, dtype=dtype),
            "patch_embed": {
                "w": vinit.xavier_uniform(keys[1], (fan, d), fan_in=fan,
                                          fan_out=d, dtype=dtype),
                "b": jnp.zeros((d,), dtype),
            },
            "encoder": encoder_init(keys[2], self.depth, d,
                                    mlp_ratio=self.mlp_ratio,
                                    qkv_bias=self.qkv_bias, dtype=dtype),
            "norm": layer_norm_init(d, dtype),
            "head": {
                "w": jax.random.uniform(keys[3], (head_in, self.num_classes),
                                        dtype, -bound, bound),
                "b": jax.random.uniform(keys[4], (self.num_classes,),
                                        dtype, -bound, bound),
            },
        }

    def pool_tokens(self, tokens):
        if self.pool == "global":
            return tokens[:, 1:].mean(axis=1)
        if self.pool == "cls":
            return tokens[:, 0]
        return jnp.concatenate([tokens[:, 0], tokens[:, 1:].mean(axis=1)], axis=1)

    def __call__(self, params, x, *, deterministic=True, rng=None):
        """x: (B, C, H, W) -> (B, num_classes)."""
        b = x.shape[0]
        p = self.patch_size
        tokens = patch_embed(x, params["patch_embed"]["w"],
                             params["patch_embed"]["b"], p, p,
                             compute_dtype=self.compute_dtype)
        cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                               (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + params["pos_embed"].astype(tokens.dtype)
        tokens, _ = encoder_apply(
            params["encoder"], tokens, self.num_heads, depth=self.depth,
            impl=self.attn_impl, drop=self.drop_rate,
            attn_drop=self.attn_drop_rate, drop_path_rate=self.drop_path_rate,
            deterministic=deterministic, rng=rng)
        tokens = layer_norm(params["norm"], tokens)
        pooled = self.pool_tokens(tokens).astype(jnp.float32)
        return linear(params["head"], pooled)

    # -- timm checkpoint interop -------------------------------------------

    def params_from_torch(self, sd):
        from mirage_tpu.api.convert import _conv_as_linear, _encoder_block, _linear, _ln, _stack

        return {
            "cls_token": jnp.asarray(sd["cls_token"]),
            "pos_embed": jnp.asarray(sd["pos_embed"]),
            "patch_embed": _conv_as_linear(sd, "patch_embed.proj"),
            "encoder": _stack([_encoder_block(sd, f"blocks.{i}")
                               for i in range(self.depth)]),
            "norm": _ln(sd, "norm"),
            "head": _linear(sd, "head"),
        }


@add_vit
def vit_base_patch16(num_classes, **kwargs):
    return VisionTransformer(num_classes=num_classes, patch_size=16,
                             embed_dim=768, depth=12, num_heads=12, **kwargs)


@add_vit
def vit_large_patch16(num_classes, **kwargs):
    return VisionTransformer(num_classes=num_classes, patch_size=16,
                             embed_dim=1024, depth=24, num_heads=16, **kwargs)
