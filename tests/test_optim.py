"""Optimizer parity vs torch AdamW (incl. decoupled wd, bias-correction) and
cosine_scheduler parity vs the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.schedules import cosine_scheduler

from conftest import requires_reference

torch = pytest.importorskip("torch")


def test_adamw_matches_torch(rng):
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    b0 = rng.standard_normal((4,)).astype(np.float32)

    # torch: decay on w, none on b (bias rule)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": 0.05},
         {"params": [tb], "weight_decay": 0.0}],
        lr=1e-2, betas=(0.9, 0.95), eps=1e-8)

    params = {"layer": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}}
    cfg = OptimizerConfig(opt="adamw", betas=(0.9, 0.95), eps=1e-8, weight_decay=0.05)
    jopt = create_optimizer(cfg)
    state = jopt.init(params)

    for step in range(5):
        g_w = rng.standard_normal((8, 4)).astype(np.float32)
        g_b = rng.standard_normal((4,)).astype(np.float32)
        tw.grad = torch.from_numpy(g_w.copy())
        tb.grad = torch.from_numpy(g_b.copy())
        opt.step()
        grads = {"layer": {"w": jnp.asarray(g_w), "b": jnp.asarray(g_b)}}
        params, state, _ = jopt.update(grads, state, params, lr=1e-2)

    np.testing.assert_allclose(np.asarray(params["layer"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer"]["b"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_layer_decay_scales():
    cfg = OptimizerConfig(opt="adamw", layer_decay=0.75, num_layers=4)
    opt = create_optimizer(cfg)
    params = {
        "input_adapters": {"bscan": {"proj": {"w": jnp.ones((2, 2))}}},
        "encoder": {"norm1": {"scale": jnp.ones((4, 8))}},
        "output_adapters": {"semseg": {"final": {"w": jnp.ones((2, 2))}}},
    }
    meta = opt.meta(params)
    assert np.isclose(meta["lr_scale"]["input_adapters"]["bscan"]["proj"]["w"],
                      0.75 ** 5)
    enc = np.asarray(meta["lr_scale"]["encoder"]["norm1"]["scale"]).ravel()
    np.testing.assert_allclose(enc, 0.75 ** (4 - np.arange(4)), rtol=1e-6)
    assert meta["lr_scale"]["output_adapters"]["semseg"]["final"]["w"] == 1.0


def test_freeze_and_skip():
    cfg = OptimizerConfig(opt="adamw", freeze_encoder=True, skip_grad=1.0)
    opt = create_optimizer(cfg)
    params = {"encoder": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
    state = opt.init(params)
    big = {"encoder": {"w": jnp.full((2,), 100.0)}, "head": {"w": jnp.full((2,), 100.0)}}
    new_params, state, gnorm = opt.update(big, state, params, lr=0.1)
    # skip_grad: norm >> 1 -> no update at all
    np.testing.assert_allclose(np.asarray(new_params["head"]["w"]), 1.0)
    small = {"encoder": {"w": jnp.full((2,), 0.01)}, "head": {"w": jnp.full((2,), 0.01)}}
    new_params, state, _ = opt.update(small, state, params, lr=0.1)
    np.testing.assert_allclose(np.asarray(new_params["encoder"]["w"]), 1.0)  # frozen
    assert not np.allclose(np.asarray(new_params["head"]["w"]), 1.0)


@requires_reference
def test_cosine_scheduler_matches(reference_path):
    from mutils.native_scaler import cosine_scheduler as ref_sched

    ours = cosine_scheduler(1e-4, 1e-6, epochs=10, niter_per_ep=7, warmup_epochs=2)
    ref = ref_sched(1e-4, 1e-6, epochs=10, niter_per_ep=7, warmup_epochs=2)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
