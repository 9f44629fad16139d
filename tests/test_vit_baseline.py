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


def _vit_sd(m, p):
    """Build a timm-style state dict from our params (inverse layout maps)."""
    d = m.embed_dim
    sd = {
        "cls_token": np.asarray(p["cls_token"]),
        "pos_embed": np.asarray(p["pos_embed"]),
        "patch_embed.proj.weight": np.asarray(p["patch_embed"]["w"]).T.reshape(
            d, m.in_chans, m.patch_size, m.patch_size),
        "patch_embed.proj.bias": np.asarray(p["patch_embed"]["b"]),
        "norm.weight": np.asarray(p["norm"]["scale"]),
        "norm.bias": np.asarray(p["norm"]["bias"]),
        "head.weight": np.asarray(p["head"]["w"]).T,
        "head.bias": np.asarray(p["head"]["b"]),
    }
    for i in range(m.depth):
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
    return sd


def test_vit_timm_roundtrip(rng):
    """params_from_torch accepts a timm-style state dict (built from our own
    params via the inverse layout transforms)."""
    from mirage_tpu.models.vit import VisionTransformer

    m = VisionTransformer(num_classes=3, img_size=32, patch_size=16,
                          in_chans=3, embed_dim=64, depth=2, num_heads=4)
    p = m.init_params(jax.random.PRNGKey(1))
    sd = _vit_sd(m, p)
    p2 = m.params_from_torch(sd)
    x = jnp.asarray(rng.random((1, 3, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(m(p, x)), np.asarray(m(p2, x)),
                               atol=1e-6)


def test_vit_pos_embed_interpolation(reference_path, rng):
    """interpolate_vit_pos_embed matches torch F.interpolate(bicubic,
    align_corners=False) on a timm-layout (1, 1+G*G, D) pos_embed."""
    import torch
    import torch.nn.functional as F

    from mirage_tpu.api.convert import interpolate_vit_pos_embed

    d = 32
    arr = rng.standard_normal((1, 1 + 14 * 14, d)).astype(np.float32)
    ours = interpolate_vit_pos_embed(arr, 32)
    pe = torch.from_numpy(arr)
    cls_tok, patch = pe[:, :1], pe[:, 1:]
    g = patch.reshape(1, 14, 14, d).permute(0, 3, 1, 2)
    g = F.interpolate(g, size=(32, 32), mode="bicubic", align_corners=False)
    want = torch.cat([cls_tok, g.permute(0, 2, 3, 1).reshape(1, -1, d)],
                     dim=1).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)
    # no-op when the grid already matches
    same = interpolate_vit_pos_embed(arr, 14)
    np.testing.assert_array_equal(same, arr)


def test_baseline_fm_interpolates_checkpoint_pos_embed(tmp_path, rng):
    """A 'timm 224-grid' checkpoint loaded at a different input size gets its
    pos_embed bicubic-resized instead of crashing at forward
    (fm_cls_config.py FoundSOTAModel analog; ADVICE r1 medium)."""
    from safetensors.numpy import save_file

    from mirage_tpu.api.fm_configs import cls_fm_factory, pick_fm
    from mirage_tpu.api.convert import params_to_torch
    from mirage_tpu.models.vit import vit_factory

    assert pick_fm(cls_fm_factory, "vit_base_x.pth").default_input_size == 224

    src = vit_factory["vit_base_patch16"](num_classes=7, img_size=224)
    sd = {k: np.asarray(v, np.float32)
          for k, v in _vit_sd(src, src.init_params(jax.random.PRNGKey(0))).items()}
    path = str(tmp_path / "vit_base_ckpt.safetensors")
    save_file(sd, path)

    fm = pick_fm(cls_fm_factory, path, linear_probing=True)
    cls = fm.build_model(num_classes=3, pool="global", weights=path,
                         input_size=512, patch_size=16)
    assert cls.params["pos_embed"].shape == (1, 1 + 32 * 32, 768)
    x = jnp.asarray(rng.random((1, 3, 512, 512)).astype(np.float32))
    out = cls.apply(cls.params, x)
    assert out.shape == (1, 3)
    assert np.all(np.isfinite(np.asarray(out)))
