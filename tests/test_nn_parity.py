"""Layer-level parity vs the PyTorch reference (golden oracle, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirage_tpu.nn.attention import attention_apply, cross_attention_apply
from mirage_tpu.nn.block import block_apply
from mirage_tpu.nn.layers import gelu, layer_norm
from mirage_tpu.nn.posemb import build_2d_sincos_posemb

from conftest import requires_reference

torch = pytest.importorskip("torch")


def t2n(t):
    return t.detach().cpu().numpy()


def lin_p(mod):
    p = {"w": t2n(mod.weight).T}
    if mod.bias is not None:
        p["b"] = t2n(mod.bias)
    return p


def ln_p(mod):
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


@requires_reference
def test_sincos_posemb_matches(reference_path):
    from mirage.utils import build_2d_sincos_posemb as ref_posemb

    for h, w, d in [(16, 16, 768), (32, 32, 1024), (4, 8, 64)]:
        ref = ref_posemb(h, w, d).numpy()
        got = np.asarray(build_2d_sincos_posemb(h, w, d))
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-6)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(gelu(jnp.asarray(x))), ref, rtol=1e-6, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 10, 96)).astype(np.float32)
    m = torch.nn.LayerNorm(96, eps=1e-6)
    torch.nn.init.normal_(m.weight)
    torch.nn.init.normal_(m.bias)
    ref = t2n(m(torch.from_numpy(x)))
    got = layer_norm(ln_p(m), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_attention_matches(reference_path, rng):
    from mirage.utils import Attention

    torch.manual_seed(0)
    m = Attention(dim=96, num_heads=4, qkv_bias=True).eval()
    x = rng.standard_normal((2, 17, 96)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(m(torch.from_numpy(x)))
    p = {"qkv": lin_p(m.qkv), "proj": lin_p(m.proj)}
    got = attention_apply(p, jnp.asarray(x), num_heads=4, impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_cross_attention_matches(reference_path, rng):
    from mirage.utils import CrossAttention

    torch.manual_seed(0)
    m = CrossAttention(dim=64, num_heads=8, qkv_bias=True).eval()
    x = rng.standard_normal((2, 9, 64)).astype(np.float32)
    ctx = rng.standard_normal((2, 21, 64)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(m(torch.from_numpy(x), torch.from_numpy(ctx)))
    p = {"q": lin_p(m.q), "kv": lin_p(m.kv), "proj": lin_p(m.proj)}
    got = cross_attention_apply(p, jnp.asarray(x), jnp.asarray(ctx), num_heads=8, impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_block_matches(reference_path, rng):
    from mirage.utils import Block

    torch.manual_seed(1)
    m = Block(dim=96, num_heads=4, mlp_ratio=4.0, qkv_bias=True).eval()
    x = rng.standard_normal((2, 33, 96)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(m(torch.from_numpy(x)))
    p = {
        "norm1": ln_p(m.norm1),
        "attn": {"qkv": lin_p(m.attn.qkv), "proj": lin_p(m.attn.proj)},
        "norm2": ln_p(m.norm2),
        "mlp": {"fc1": lin_p(m.mlp.fc1), "fc2": lin_p(m.mlp.fc2)},
    }
    got = block_apply(p, jnp.asarray(x), num_heads=4, impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_patched_input_adapter_matches(reference_path, rng):
    from mirage.input_adapters import PatchedInputAdapter as RefAdapter

    torch.manual_seed(2)
    ref_ad = RefAdapter(num_channels=1, stride_level=1, patch_size_full=(32, 32),
                        image_size=512)
    ref_ad.init(dim_tokens=96)
    ref_ad.eval()
    x = rng.random((1, 1, 512, 512)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(ref_ad(torch.from_numpy(x)))

    from mirage_tpu.adapters.input_adapters import PatchedInputAdapter

    ad = PatchedInputAdapter(num_channels=1, stride_level=1, patch_size_full=32,
                             image_size=512)
    w = t2n(ref_ad.proj.weight)
    p = {
        "pos_emb": jnp.asarray(t2n(ref_ad.pos_emb)),
        "proj": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                 "b": jnp.asarray(t2n(ref_ad.proj.bias))},
    }
    got = ad(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_semseg_input_adapter_matches(reference_path, rng):
    from mirage.input_adapters import SemSegInputAdapter as RefAdapter

    torch.manual_seed(3)
    ref_ad = RefAdapter(num_classes=13, stride_level=1, patch_size_full=8,
                        image_size=128, dim_class_emb=64)
    ref_ad.init(dim_tokens=96)
    ref_ad.eval()
    x = rng.integers(0, 13, (1, 128, 128))
    with torch.no_grad():
        ref = t2n(ref_ad(torch.from_numpy(x)))

    from mirage_tpu.adapters.input_adapters import SemSegInputAdapter

    ad = SemSegInputAdapter(num_classes=13, stride_level=1, patch_size_full=8,
                            image_size=128, dim_class_emb=64)
    w = t2n(ref_ad.proj.weight)
    p = {
        "pos_emb": jnp.asarray(t2n(ref_ad.pos_emb)),
        "class_emb": jnp.asarray(t2n(ref_ad.class_emb.weight)),
        "proj": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                 "b": jnp.asarray(t2n(ref_ad.proj.bias))},
    }
    got = ad(p, jnp.asarray(x, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@requires_reference
def test_semseg_input_adapter_interpolate_class_emb(reference_path, rng):
    """interpolate_class_emb=True path: bilinear downsample + 1x1 conv
    (input_adapters.py:194-205), plus emb_padding_idx."""
    from mirage.input_adapters import SemSegInputAdapter as RefAdapter

    torch.manual_seed(4)
    ref_ad = RefAdapter(num_classes=4, stride_level=4, patch_size_full=32,
                        image_size=128, dim_class_emb=64,
                        interpolate_class_emb=True, emb_padding_idx=4)
    ref_ad.init(dim_tokens=96)
    ref_ad.eval()
    x = rng.integers(0, 5, (2, 32, 32))  # includes the padding index 4
    with torch.no_grad():
        ref = t2n(ref_ad(torch.from_numpy(x)))

    from mirage_tpu.adapters.input_adapters import SemSegInputAdapter

    ad = SemSegInputAdapter(num_classes=4, stride_level=4, patch_size_full=32,
                            image_size=128, dim_class_emb=64,
                            interpolate_class_emb=True, emb_padding_idx=4)
    # interpolate path: proj is Sequential(Upsample, Conv 1x1) -> proj.1
    w = t2n(ref_ad.proj[1].weight)
    p = {
        "pos_emb": jnp.asarray(t2n(ref_ad.pos_emb)),
        "class_emb": jnp.asarray(t2n(ref_ad.class_emb.weight)),
        "proj": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                 "b": jnp.asarray(t2n(ref_ad.proj[1].bias))},
    }
    got = ad(p, jnp.asarray(x, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
