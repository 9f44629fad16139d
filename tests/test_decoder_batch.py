"""Task-batched decoder tails (spatial_output.batched_spatial_decode).

The three pretraining SpatialOutputAdapters share one config
(run_pretraining.py:136-148: dim 256 / depth 2 / heads 8, 256 tokens per
task), so their transformer tails can run as ONE set of task-vmapped kernel
dispatches. These tests pin that the batched path is numerically identical
to the per-task loop — on the XLA path and through the REAL Pallas kernel
code (interpret mode), forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mirage_tpu.models.mirage as mm
from mirage_tpu.adapters.input_adapters import PatchedInputAdapter, SemSegInputAdapter
from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter, decoders_batchable
from mirage_tpu.models.mirage import MIRAGEModel
from mirage_tpu.ops import runtime as rt


DOMAINS = ("bscan", "slo", "bscanlayermap")


def _model():
    input_adapters = {
        "bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                     image_size=128),
        "slo": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                   image_size=128),
        "bscanlayermap": SemSegInputAdapter(num_classes=13, patch_size_full=(8, 8),
                                            image_size=32, dim_class_emb=16),
    }
    output_adapters = {
        d: SpatialOutputAdapter(
            num_channels=13 if d == "bscanlayermap" else 1,
            patch_size_full=(8, 8) if d == "bscanlayermap" else (32, 32),
            dim_tokens=64, depth=2, num_heads=2, task=d,
            context_tasks=DOMAINS, use_task_queries=True, use_xattn=True,
            image_size=(32, 32) if d == "bscanlayermap" else (128, 128))
        for d in DOMAINS
    }
    return MIRAGEModel(input_adapters=input_adapters,
                       output_adapters=output_adapters,
                       dim_tokens=96, depth=2, num_heads=2)


def _batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "bscan": jnp.asarray(rng.random((b, 1, 128, 128)), jnp.float32),
        "slo": jnp.asarray(rng.random((b, 1, 128, 128)), jnp.float32),
        "bscanlayermap": jnp.asarray(rng.integers(0, 13, (b, 32, 32)), jnp.int32),
    }


@pytest.fixture
def restore_dec_batch():
    old = mm._DEC_BATCH
    yield
    mm._DEC_BATCH = old


def test_batchable_detection():
    model = _model()
    info = model.generate_input_info(_batch())
    assert decoders_batchable(model.output_adapters, info)
    # heterogeneous depth -> not batchable
    oa = dict(model.output_adapters)
    oa["bscan"] = SpatialOutputAdapter(
        num_channels=1, patch_size_full=(32, 32), dim_tokens=64, depth=1,
        num_heads=2, task="bscan", context_tasks=DOMAINS,
        use_task_queries=True, use_xattn=True, image_size=(128, 128))
    assert not decoders_batchable(oa, info)
    # single adapter -> not batchable
    assert not decoders_batchable({"bscan": model.output_adapters["bscan"]}, info)


def test_batched_matches_per_task_train(restore_dec_batch):
    """Masked training forward + grads: batched == per-task (XLA path)."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()

    def loss(params, on):
        mm._DEC_BATCH = on
        preds, _ = model(params, batch, mask_inputs=True,
                         num_encoded_tokens=12, rng=jax.random.PRNGKey(7),
                         deterministic=False)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in preds.values())

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_batched_matches_per_task_kernels_interpret(restore_dec_batch):
    """Through the REAL kernel code (interpret mode): jax.vmap lifts each
    pallas_call onto an extra grid dimension; outputs and grads must match
    the per-task dispatches."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()

    def loss(params, on):
        mm._DEC_BATCH = on
        preds, _ = model(params, batch, mask_inputs=True,
                         num_encoded_tokens=12, rng=jax.random.PRNGKey(7),
                         deterministic=False)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in preds.values())

    with rt.forced("interpret"):
        v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_batched_matches_per_task_inference(restore_dec_batch):
    """Explicit-mask (wrapper) inference, deterministic fused-tail route,
    XLA path: batched == per-task."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    masks = {"bscan": jnp.zeros((2, 16), jnp.int32),
             "slo": jnp.ones((2, 16), jnp.int32),
             "bscanlayermap": jnp.ones((2, 16), jnp.int32)}

    def infer(on):
        mm._DEC_BATCH = on
        preds, _ = model(params, batch, mask_inputs=False, task_masks=masks,
                         num_visible=16, deterministic=True)
        return preds

    i0 = infer(False)
    i1 = infer(True)
    for k in i0:
        np.testing.assert_allclose(np.asarray(i0[k]), np.asarray(i1[k]),
                                   rtol=1e-6, atol=1e-6)
