"""Fast learning smokes in the DEFAULT suite: a few dozen optimizer steps on
tiny configs asserting the loss actually goes down, so optimizer-semantics
regressions fail CI without RUN_SLOW (full-length learning validation lives
in test_learning_slow.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def pretrain_setup():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_mirage
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    model = _build_mirage("tiny", img=64, layermap=16)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
    domain_conf = {
        "bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
        "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
        "bscanlayermap": {"loss": "ce", "patch_size": 8},
    }
    loss_fn = make_pretrain_loss(model, domain_conf, num_encoded_tokens=6,
                                 alphas=1.0, sample_tasks_uniformly=True)
    step = make_train_step(loss_fn, opt)
    return init_train_state(params, opt), step


def test_pretrain_steps_reduce_loss(pretrain_setup, rng):
    """~25 steps of the real pretraining train step (Dirichlet masking, three
    decoders, masked MSE+CE, AdamW) on one small batch: loss must drop."""
    state, step = pretrain_setup
    b = 8
    batch = {
        "bscan": jnp.asarray(rng.random((b, 1, 64, 64)), jnp.float32),
        "slo": jnp.asarray(rng.random((b, 1, 64, 64)), jnp.float32),
        "bscanlayermap": jnp.asarray(rng.integers(0, 13, (b, 16, 16)), jnp.int32),
    }
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i),
                              1e-3, 1.0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])


def test_seg_head_steps_reduce_loss(rng):
    """~20 steps of seg tuning (frozen tiny encoder + ConvNeXt head,
    CE+GDice): loss must drop."""
    from mirage_tpu.adapters import ConvNeXtAdapter, PatchedInputAdapter
    from mirage_tpu.losses import ce_gdice_loss
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state, make_train_step

    model = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(8, 8), image_size=64)},
        output_adapters={"semseg": ConvNeXtAdapter(
            num_classes=3, patch_size=8, preds_per_patch=4, depth=1,
            embed_dim=96, main_tasks=("bscan",), task="semseg",
            image_size=(64, 64))},
        dim_tokens=96, depth=2, num_heads=4)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", weight_decay=0.05, layer_decay=0.75,
        num_layers=model.depth, freeze_encoder=True))

    b = 4
    images = jnp.asarray(rng.random((b, 1, 64, 64)), jnp.float32)
    seg = np.zeros((b, 64, 64), np.int32)
    seg[:, 16:48, 16:48] = 1
    seg[:, 24:40, 24:40] = 2
    seg = jnp.asarray(seg)

    def loss_fn(params_, batch, rng_):
        preds = model.forward_light(params_, {"bscan": batch["bscan"]},
                                    deterministic=False, rng=rng_)
        return ce_gdice_loss(preds["semseg"].astype(jnp.float32),
                             batch["semseg"]), {}

    step = make_train_step(loss_fn, opt)
    state = init_train_state(params, opt)
    batch = {"bscan": images, "semseg": seg}
    losses = []
    for i in range(20):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 1e-3, 1.0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.8 * losses[0], (losses[0], losses[-1])
