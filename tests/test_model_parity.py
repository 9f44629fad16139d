"""End-to-end parity: full MIRAGE model vs the PyTorch reference.

Builds the reference MIRAGEModel (random init, CPU), converts its state_dict
into our param pytree, and compares:
  1. wrapper-style inference (bscan present, others zero-filled + masked)
  2. full three-modality reconstruction with explicit masks
  3. encoder-only light forward (HF feature path)
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

DIM = 192  # small ViT for test speed; all code paths identical to base/large
DEPTH = 3
HEADS = 4


def build_reference_model(reference_path, with_outputs=True,
                          dim=DIM, depth=DEPTH, heads=HEADS,
                          dec_dim=64, dec_depth=2, dec_heads=4):
    from functools import partial

    from mirage.input_adapters import PatchedInputAdapter, SemSegInputAdapter
    from mirage.output_adapters import SpatialOutputAdapter
    from mirage.model import MIRAGEModel

    domains = ["bscan", "slo", "bscanlayermap"]
    args = SimpleNamespace(
        input_size={"bscan": (512, 512), "slo": (512, 512), "bscanlayermap": (128, 128)},
        grid_sizes=None,
    )
    input_adapters = {
        "bscan": PatchedInputAdapter(num_channels=1, stride_level=1,
                                     patch_size_full=(32, 32), image_size=512),
        "slo": PatchedInputAdapter(num_channels=1, stride_level=1,
                                   patch_size_full=(32, 32), image_size=512),
        "bscanlayermap": SemSegInputAdapter(num_classes=13, stride_level=1,
                                            patch_size_full=(8, 8), image_size=128,
                                            dim_class_emb=64),
    }
    output_adapters = None
    if with_outputs:
        output_adapters = {
            d: SpatialOutputAdapter(
                num_channels=13 if d == "bscanlayermap" else 1,
                stride_level=1,
                patch_size_full=(8, 8) if d == "bscanlayermap" else (32, 32),
                dim_tokens=dec_dim, depth=dec_depth, num_heads=dec_heads,
                use_task_queries=True, task=d, context_tasks=domains,
                use_xattn=True,
                image_size=(128, 128) if d == "bscanlayermap" else (512, 512),
            )
            for d in domains
        }
    torch.manual_seed(0)
    model = MIRAGEModel(args, input_adapters, output_adapters,
                        dim_tokens=dim, depth=depth, num_heads=heads,
                        mlp_ratio=4, qkv_bias=True).eval()
    return model


def build_our_model(with_outputs=True, dim=DIM, depth=DEPTH, heads=HEADS,
                    dec_dim=64, dec_depth=2, dec_heads=4):
    from mirage_tpu.adapters.input_adapters import PatchedInputAdapter, SemSegInputAdapter
    from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel

    domains = ("bscan", "slo", "bscanlayermap")
    input_adapters = {
        "bscan": PatchedInputAdapter(num_channels=1, stride_level=1,
                                     patch_size_full=(32, 32), image_size=512),
        "slo": PatchedInputAdapter(num_channels=1, stride_level=1,
                                   patch_size_full=(32, 32), image_size=512),
        "bscanlayermap": SemSegInputAdapter(num_classes=13, stride_level=1,
                                            patch_size_full=(8, 8), image_size=128,
                                            dim_class_emb=64),
    }
    output_adapters = None
    if with_outputs:
        output_adapters = {
            d: SpatialOutputAdapter(
                num_channels=13 if d == "bscanlayermap" else 1,
                stride_level=1,
                patch_size_full=(8, 8) if d == "bscanlayermap" else (32, 32),
                dim_tokens=dec_dim, depth=dec_depth, num_heads=dec_heads,
                use_task_queries=True, task=d, context_tasks=domains,
                use_xattn=True,
                image_size=(128, 128) if d == "bscanlayermap" else (512, 512),
            )
            for d in domains
        }
    return MIRAGEModel(input_adapters=input_adapters, output_adapters=output_adapters,
                       dim_tokens=dim, depth=depth, num_heads=heads, attn_impl="xla")


def make_inputs(rng, batch=1):
    return {
        "bscan": rng.random((batch, 1, 512, 512), dtype=np.float32),
        "slo": rng.random((batch, 1, 512, 512), dtype=np.float32),
        "bscanlayermap": rng.integers(0, 13, (batch, 128, 128)),
    }


def convert(ref_model, our_model):
    from mirage_tpu.api.convert import torch_to_params

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    return torch_to_params(sd, our_model)


@requires_reference
def test_wrapper_inference_bscan_only(reference_path, rng):
    ref_model = build_reference_model(reference_path)
    our_model = build_our_model()
    params = convert(ref_model, our_model)

    x = make_inputs(rng)
    grid = {"bscan": 256, "slo": 256, "bscanlayermap": 256}
    masks_np = {
        "bscan": np.zeros((1, 256), np.int64),
        "slo": np.ones((1, 256), np.int64),
        "bscanlayermap": np.ones((1, 256), np.int64),
    }
    xt = {
        "bscan": torch.from_numpy(x["bscan"]),
        "slo": torch.zeros(1, 1, 512, 512),
        "bscanlayermap": torch.zeros(1, 128, 128, dtype=torch.long),
    }
    with torch.no_grad():
        ref_preds, _ = ref_model(
            {k: v for k, v in xt.items()},
            mask_inputs=False,
            task_masks={k: torch.from_numpy(v) for k, v in masks_np.items()},
        )

    xj = {
        "bscan": jnp.asarray(x["bscan"]),
        "slo": jnp.zeros((1, 1, 512, 512), jnp.float32),
        "bscanlayermap": jnp.zeros((1, 128, 128), jnp.int32),
    }
    preds, _ = our_model(
        params, xj, mask_inputs=False,
        task_masks={k: jnp.asarray(v) for k, v in masks_np.items()},
        num_visible=grid["bscan"],
    )
    for k in ref_preds:
        np.testing.assert_allclose(
            np.asarray(preds[k]), ref_preds[k].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"pred mismatch for task {k}")


@requires_reference
def test_full_multimodal_reconstruction(reference_path, rng):
    ref_model = build_reference_model(reference_path)
    our_model = build_our_model()
    params = convert(ref_model, our_model)

    x = make_inputs(rng)
    # random-ish but explicit masks: 98 visible among 768
    flat = np.ones(768, np.int64)
    vis_idx = np.random.default_rng(1).choice(768, 98, replace=False)
    flat[vis_idx] = 0
    masks_np = {
        "bscan": flat[:256][None],
        "slo": flat[256:512][None],
        "bscanlayermap": flat[512:][None],
    }
    xt = {
        "bscan": torch.from_numpy(x["bscan"]),
        "slo": torch.from_numpy(x["slo"]),
        "bscanlayermap": torch.from_numpy(x["bscanlayermap"]),
    }
    with torch.no_grad():
        ref_preds, _ = ref_model(
            xt, mask_inputs=False,
            task_masks={k: torch.from_numpy(v) for k, v in masks_np.items()})

    xj = {
        "bscan": jnp.asarray(x["bscan"]),
        "slo": jnp.asarray(x["slo"]),
        "bscanlayermap": jnp.asarray(x["bscanlayermap"], dtype=jnp.int32),
    }
    preds, _ = our_model(
        params, xj, mask_inputs=False,
        task_masks={k: jnp.asarray(v) for k, v in masks_np.items()},
        num_visible=98)
    for k in ref_preds:
        np.testing.assert_allclose(
            np.asarray(preds[k]), ref_preds[k].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"pred mismatch for task {k}")


@requires_reference
def test_light_forward_features(reference_path, rng):
    """Encoder-only multimodal features (hf/mirage_hf.py path)."""
    ref_model = build_reference_model(reference_path, with_outputs=False)
    our_model = build_our_model(with_outputs=False)
    params = convert(ref_model, our_model)

    x = make_inputs(rng)
    xt = {"bscan": torch.from_numpy(x["bscan"]), "slo": torch.from_numpy(x["slo"])}
    # MIRAGELight shares weights/forward helpers; emulate via full-visibility
    from mirage.model import MIRAGELight

    ref_light = MIRAGELight.__new__(MIRAGELight)
    ref_light.__dict__ = ref_model.__dict__
    with torch.no_grad():
        ref_tokens = MIRAGELight.forward(ref_light, xt)

    xj = {"bscan": jnp.asarray(x["bscan"]), "slo": jnp.asarray(x["slo"])}
    tokens = our_model.forward_light(params, xj)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                               rtol=1e-4, atol=1e-5)


@requires_reference
def test_absent_tasks_skip_matches_full_compute(reference_path, rng):
    """absent_tasks (the wrapper's static fully-masked-modality shortcut)
    must be a pure compute skip: outputs identical to embedding the
    zero-filled modalities."""
    our_model = build_our_model()
    import jax

    params = our_model.init_params(jax.random.PRNGKey(0))
    x = {
        "bscan": jnp.asarray(rng.random((1, 1, 512, 512)).astype(np.float32)),
        "slo": jnp.zeros((1, 1, 512, 512), jnp.float32),
        "bscanlayermap": jnp.zeros((1, 128, 128), jnp.int32),
    }
    masks = {
        "bscan": jnp.zeros((1, 256), jnp.int32),
        "slo": jnp.ones((1, 256), jnp.int32),
        "bscanlayermap": jnp.ones((1, 256), jnp.int32),
    }
    full, _ = our_model(params, x, mask_inputs=False, task_masks=masks,
                        num_visible=256)
    skip, _ = our_model(params, x, mask_inputs=False, task_masks=masks,
                        num_visible=256,
                        absent_tasks=("slo", "bscanlayermap"))
    for k in full:
        np.testing.assert_allclose(np.asarray(skip[k]), np.asarray(full[k]),
                                   atol=1e-6, err_msg=k)
