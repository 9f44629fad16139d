"""Parity tests: downstream seg heads vs the PyTorch reference.

Random-init the reference adapter, convert its state_dict via
``params_from_torch``, run both on identical random encoder tokens, compare.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

DIM = 96          # encoder token dim (small for speed)
B = 2
IMG = (64, 64)
PATCH = (8, 8)
GRID = (IMG[0] // PATCH[0], IMG[1] // PATCH[1])
N = GRID[0] * GRID[1]
NCLS = 5


def input_info():
    return {
        "tasks": {"bscan": {"num_tokens": N, "has_posemb": True, "start_idx": 0,
                            "end_idx": N, "image_size": IMG, "grid_size": GRID}},
        "num_task_tokens": N,
        "num_global_tokens": 1,
    }


def tokens(rng, n_layers=None):
    if n_layers is None:
        return rng.standard_normal((B, N + 1, DIM)).astype(np.float32)
    return [rng.standard_normal((B, N + 1, DIM)).astype(np.float32)
            for _ in range(n_layers)]


def to_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@requires_reference
def test_convnext_adapter_parity(reference_path, rng):
    from mirage.output_adapters import ConvNeXtAdapter as RefConvNeXt
    from mirage_tpu.adapters.seg_heads import ConvNeXtAdapter

    torch.manual_seed(0)
    ref = RefConvNeXt(num_classes=NCLS, embed_dim=384, preds_per_patch=16,
                      patch_size=list(PATCH), depth=2, task="bscan").eval()
    ref.init(dim_tokens_enc=DIM)

    ours = ConvNeXtAdapter(num_classes=NCLS, embed_dim=384, preds_per_patch=16,
                           patch_size=PATCH, depth=2, task="bscan")
    params = ours.params_from_torch({f"x.{k}": v for k, v in to_sd(ref).items()}, "x")

    t = tokens(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(t), input_info()).numpy()
    got = np.asarray(ours(params, jnp.asarray(t), input_info()))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@requires_reference
def test_linear_seg_adapter_parity(reference_path, rng):
    from mirage.output_adapters import LinearSegAdapter as RefLinear
    from mirage_tpu.adapters.seg_heads import LinearSegAdapter

    torch.manual_seed(0)
    ref = RefLinear(num_classes=NCLS, patch_size=list(PATCH), task="bscan").eval()
    ref.init(dim_tokens_enc=DIM)
    ours = LinearSegAdapter(num_classes=NCLS, patch_size=PATCH, task="bscan")
    params = ours.params_from_torch({f"x.{k}": v for k, v in to_sd(ref).items()}, "x")

    t = tokens(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(t), input_info()).numpy()
    got = np.asarray(ours(params, jnp.asarray(t), input_info()))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@requires_reference
def test_segmenter_adapter_parity(reference_path, rng):
    from mirage.output_adapters import SegmenterMaskTransformerAdapter as RefSeg
    from mirage_tpu.adapters.seg_heads import SegmenterMaskTransformerAdapter

    torch.manual_seed(0)
    ref = RefSeg(num_classes=NCLS, depth=2, num_heads=4, embed_dim=DIM,
                 patch_size=list(PATCH), task="bscan").eval()
    ref.init(dim_tokens_enc=DIM)
    ours = SegmenterMaskTransformerAdapter(
        num_classes=NCLS, depth=2, num_heads=4, embed_dim=DIM,
        patch_size=PATCH, task="bscan")
    params = ours.params_from_torch({f"x.{k}": v for k, v in to_sd(ref).items()}, "x")

    t = tokens(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(t), input_info()).numpy()
    got = np.asarray(ours(params, jnp.asarray(t), input_info()))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@requires_reference
@pytest.mark.parametrize("use_bn", [False, True])
def test_dpt_adapter_parity(reference_path, rng, use_bn):
    from mirage.output_adapters import DPTOutputAdapter as RefDPT
    from mirage_tpu.adapters.seg_heads import DPTOutputAdapter

    torch.manual_seed(0)
    ref = RefDPT(num_classes=NCLS, patch_size=list(PATCH), hooks=[0, 1, 2, 3],
                 layer_dims=[24, 48, 96, 192], feature_dim=64, use_bn=use_bn,
                 task="bscan").eval()
    ref.init(dim_tokens_enc=DIM)
    ours = DPTOutputAdapter(num_classes=NCLS, patch_size=PATCH, hooks=(0, 1, 2, 3),
                            layer_dims=(24, 48, 96, 192), feature_dim=64,
                            use_bn=use_bn, task="bscan")
    params = ours.params_from_torch({f"x.{k}": v for k, v in to_sd(ref).items()}, "x")

    t = tokens(rng, n_layers=4)
    with torch.no_grad():
        want = ref([torch.from_numpy(l) for l in t], input_info()).numpy()
    got = np.asarray(ours(params, [jnp.asarray(l) for l in t], input_info()))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


@requires_reference
def test_dpt_regression_head_parity(reference_path, rng):
    from mirage.output_adapters import DPTOutputAdapter as RefDPT
    from mirage_tpu.adapters.seg_heads import DPTOutputAdapter

    torch.manual_seed(0)
    ref = RefDPT(num_classes=1, patch_size=list(PATCH), hooks=[0, 1, 2, 3],
                 layer_dims=[24, 48, 96, 192], feature_dim=64,
                 head_type="regression", task="bscan").eval()
    ref.init(dim_tokens_enc=DIM)
    ours = DPTOutputAdapter(num_classes=1, patch_size=PATCH, hooks=(0, 1, 2, 3),
                            layer_dims=(24, 48, 96, 192), feature_dim=64,
                            head_type="regression", task="bscan")
    params = ours.params_from_torch({f"x.{k}": v for k, v in to_sd(ref).items()}, "x")

    t = tokens(rng, n_layers=4)
    with torch.no_grad():
        want = ref([torch.from_numpy(l) for l in t], input_info()).numpy()
    got = np.asarray(ours(params, [jnp.asarray(l) for l in t], input_info()))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


def test_seg_heads_init_shapes():
    """init_params produces pytrees usable by the forward (no torch needed)."""
    import jax
    from mirage_tpu.adapters.seg_heads import (
        ConvNeXtAdapter, DPTOutputAdapter, LinearSegAdapter,
        SegmenterMaskTransformerAdapter)

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((B, N + 1, DIM)).astype(np.float32))
    info = input_info()

    heads = [
        ConvNeXtAdapter(num_classes=NCLS, embed_dim=384, preds_per_patch=16,
                        patch_size=PATCH, depth=2, task="bscan"),
        LinearSegAdapter(num_classes=NCLS, patch_size=PATCH, task="bscan"),
        SegmenterMaskTransformerAdapter(num_classes=NCLS, depth=2, num_heads=4,
                                        embed_dim=DIM, patch_size=PATCH, task="bscan"),
    ]
    for head in heads:
        p = head.init_params(key, DIM)
        out = head(p, t, info)
        assert out.shape == (B, NCLS, *IMG), type(head).__name__

    dpt = DPTOutputAdapter(num_classes=NCLS, patch_size=PATCH, hooks=(0, 1, 2, 3),
                           layer_dims=(24, 48, 96, 192), feature_dim=64, task="bscan")
    p = dpt.init_params(key, DIM)
    layers = [t] * 4
    out = dpt(p, layers, info)
    # DPT output is at half input resolution *2 via head upsample chain:
    # grid 8 -> 32 (act1 4x) ... final head 2x of path_1 (grid*8) = 128? For
    # patch 8 grid 8: path1 is grid*8=64 -> head 2x => 128 = 2*IMG. The
    # reference behaves identically (its output is then resized by the loss
    # caller); just assert consistent channel count here.
    assert out.shape[:2] == (B, NCLS)


def test_dpt_training_path_jits_with_drop_path(rng):
    """The return_all_layers (DPT) branch must trace under jit+grad with a
    nonzero drop-path: a traced jnp.linspace float() raised
    ConcretizationTypeError here, and the short-lived grad_free raw-kernel
    path tripped JAX's jvp bookkeeping."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.adapters import DPTOutputAdapter, PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel

    model = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(16, 16), image_size=64)},
        output_adapters={"semseg": DPTOutputAdapter(
            num_classes=3, stride_level=1, patch_size=16, hooks=(0, 1, 2, 3),
            main_tasks=("bscan",), task="semseg", image_size=(64, 64),
            head_type="semseg")},
        dim_tokens=96, depth=4, num_heads=4, drop_path_rate=0.1)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 1, 64, 64)).astype(np.float32))

    def loss(p):
        preds = model.forward_light(p, {"bscan": x}, return_all_layers=True,
                                    deterministic=False,
                                    rng=jax.random.PRNGKey(1),
                                    frozen_encoder=True)
        return jnp.sum(preds["semseg"].astype(jnp.float32) ** 2) / 1e3

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    gsum = sum(float(jnp.sum(jnp.abs(g).astype(jnp.float32)))
               for g in jax.tree_util.tree_leaves(grads["output_adapters"]))
    assert np.isfinite(gsum) and gsum > 0
