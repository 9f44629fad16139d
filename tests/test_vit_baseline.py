"""Baseline ViT classifier: shape tests + timm-key checkpoint interop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("pool", ["global", "cls", "token_mix"])
def test_vit_pools(pool, rng):
    from mirage_tpu.models.vit import VisionTransformer

    m = VisionTransformer(num_classes=5, img_size=32, patch_size=16,
                          in_chans=3, embed_dim=64, depth=2, num_heads=4,
                          pool=pool)
    p = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 3, 32, 32)).astype(np.float32))
    out = jax.jit(lambda p, x: m(p, x))(p, x)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))
    head_in = p["head"]["w"].shape[0]
    assert head_in == (128 if pool == "token_mix" else 64)


def test_vit_registry():
    from mirage_tpu.models.vit import vit_factory

    assert set(vit_factory) >= {"vit_base_patch16", "vit_large_patch16"}


def test_vit_timm_roundtrip(rng):
    """params_from_torch accepts a timm-style state dict (built from our own
    params via the inverse layout transforms)."""
    from mirage_tpu.models.vit import VisionTransformer

    m = VisionTransformer(num_classes=3, img_size=32, patch_size=16,
                          in_chans=3, embed_dim=64, depth=2, num_heads=4)
    p = m.init_params(jax.random.PRNGKey(1))

    sd = {
        "cls_token": np.asarray(p["cls_token"]),
        "pos_embed": np.asarray(p["pos_embed"]),
        "patch_embed.proj.weight": np.asarray(p["patch_embed"]["w"]).T.reshape(64, 3, 16, 16),
        "patch_embed.proj.bias": np.asarray(p["patch_embed"]["b"]),
        "norm.weight": np.asarray(p["norm"]["scale"]),
        "norm.bias": np.asarray(p["norm"]["bias"]),
        "head.weight": np.asarray(p["head"]["w"]).T,
        "head.bias": np.asarray(p["head"]["b"]),
    }
    for i in range(2):
        blk = jax.tree_util.tree_map(lambda x: x[i], p["encoder"])
        sd[f"blocks.{i}.norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        sd[f"blocks.{i}.norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        sd[f"blocks.{i}.attn.qkv.weight"] = np.asarray(blk["attn"]["qkv"]["w"]).T
        sd[f"blocks.{i}.attn.qkv.bias"] = np.asarray(blk["attn"]["qkv"]["b"])
        sd[f"blocks.{i}.attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["w"]).T
        sd[f"blocks.{i}.attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["b"])
        sd[f"blocks.{i}.norm2.weight"] = np.asarray(blk["norm2"]["scale"])
        sd[f"blocks.{i}.norm2.bias"] = np.asarray(blk["norm2"]["bias"])
        sd[f"blocks.{i}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["fc1"]["w"]).T
        sd[f"blocks.{i}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["fc1"]["b"])
        sd[f"blocks.{i}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["fc2"]["w"]).T
        sd[f"blocks.{i}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["fc2"]["b"])

    p2 = m.params_from_torch(sd)
    x = jnp.asarray(rng.random((1, 3, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(m(p, x)), np.asarray(m(p2, x)),
                               atol=1e-6)
