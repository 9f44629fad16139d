"""Multi-chip sharding: full pretraining train step over an 8-device mesh
(data=2, fsdp=2, tensor=2) on the virtual CPU backend."""

import numpy as np

import jax
import jax.numpy as jnp

from mirage_tpu.adapters.input_adapters import PatchedInputAdapter, SemSegInputAdapter
from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter
from mirage_tpu.models.mirage import MIRAGEModel
from mirage_tpu.parallel.mesh import make_mesh
from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.steps import (
    init_train_state,
    make_pretrain_loss,
    make_train_step,
    shard_batch,
    shard_state,
)


def tiny_pretrain_model(dim=128, depth=2, heads=4):
    domains = ("bscan", "slo", "bscanlayermap")
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
            dim_tokens=64, depth=1, num_heads=4, task=d,
            context_tasks=domains,
            image_size=(32, 32) if d == "bscanlayermap" else (128, 128))
        for d in domains
    }
    return MIRAGEModel(input_adapters=input_adapters,
                       output_adapters=output_adapters,
                       dim_tokens=dim, depth=depth, num_heads=heads,
                       attn_impl="xla")


DOMAIN_CONF = {
    "bscan": {"loss": "mse", "patch_size": 32, "norm_pix": False},
    "slo": {"loss": "mse", "patch_size": 32, "norm_pix": False},
    "bscanlayermap": {"loss": "ce", "patch_size": 8},
}


def make_batch(batch=8):
    rng = np.random.default_rng(0)
    return {
        "bscan": jnp.asarray(rng.random((batch, 1, 128, 128)), jnp.float32),
        "slo": jnp.asarray(rng.random((batch, 1, 128, 128)), jnp.float32),
        "bscanlayermap": jnp.asarray(rng.integers(0, 13, (batch, 32, 32)), jnp.int32),
    }


def test_sharded_pretrain_step_runs_and_matches_single_device():
    assert jax.device_count() == 8
    model = tiny_pretrain_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, donate=False)

    batch = make_batch()
    rng = jax.random.PRNGKey(1)

    # Single-device reference
    state0 = init_train_state(params, opt)
    state_ref, metrics_ref = step(state0, batch, rng, 1e-4, 1.0)

    # Sharded over the 2x2x2 mesh
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    state1 = shard_state(init_train_state(params, opt), mesh)
    sbatch = shard_batch(batch, mesh)
    with mesh:
        state_sh, metrics_sh = step(state1, sbatch, rng, 1e-4, 1.0)

    np.testing.assert_allclose(float(metrics_sh["loss"]), float(metrics_ref["loss"]),
                               rtol=1e-4)
    # parameters evolve identically (same rng, same data)
    l_ref = jax.tree_util.tree_leaves(state_ref["params"])
    l_sh = jax.tree_util.tree_leaves(state_sh["params"])
    for a, b in zip(l_ref, l_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5)


def test_mesh_default_data_parallel():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["fsdp"] == 1 and mesh.shape["tensor"] == 1


def test_sharded_seg_step():
    """Downstream seg tuning step (frozen encoder + ConvNeXt head) sharded
    over the full 2x2x2 mesh matches single-device."""
    from mirage_tpu.adapters.seg_heads import ConvNeXtAdapter
    from mirage_tpu.losses import ce_gdice_loss

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(16, 16),
                                        image_size=64)}
    outs = {"semseg": ConvNeXtAdapter(num_classes=4, embed_dim=256,
                                      preds_per_patch=16, patch_size=(16, 16),
                                      depth=1, task="bscan",
                                      image_size=(64, 64))}
    model = MIRAGEModel(input_adapters=ins, output_adapters=outs,
                        dim_tokens=128, depth=2, num_heads=4, attn_impl="xla")
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           layer_decay=0.75, num_layers=2,
                                           freeze_encoder=True))

    def loss_fn(p, batch, rng):
        preds = model.forward_light(p, {"bscan": batch["bscan"]})
        return ce_gdice_loss(preds["semseg"].astype(jnp.float32),
                             batch["semseg"]), {}

    step = make_train_step(loss_fn, opt, donate=False)
    rng = np.random.default_rng(1)
    batch = {"bscan": jnp.asarray(rng.random((8, 1, 64, 64)), jnp.float32),
             "semseg": jnp.asarray(rng.integers(0, 4, (8, 64, 64)), jnp.int32)}

    state_ref, m_ref = step(init_train_state(params, opt), batch,
                            jax.random.PRNGKey(2), 1e-4, 1.0)
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    state1 = shard_state(init_train_state(params, opt), mesh)
    with mesh:
        state_sh, m_sh = step(state1, shard_batch(batch, mesh),
                              jax.random.PRNGKey(2), 1e-4, 1.0)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-4)
    # frozen encoder must not move, on either path
    for got, want in zip(jax.tree_util.tree_leaves(state_sh["params"]["encoder"]),
                         jax.tree_util.tree_leaves(params["encoder"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wrapper_multichip_inference(tmp_path):
    """MIRAGEWrapper(mesh=...): Large-style serving sharded over the mesh
    matches single-chip output."""
    import torch

    from types import SimpleNamespace

    from mirage_tpu.adapters import PatchedInputAdapter, SemSegInputAdapter
    from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter as Ours
    from mirage_tpu.api.convert import params_to_torch
    from mirage_tpu.api.wrapper import MIRAGEWrapper
    from mirage_tpu.models.mirage import MIRAGEModel as Core

    # tiny checkpoint in the reference format
    domains = ["bscan", "slo", "bscanlayermap"]
    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                        image_size=512),
           "slo": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                      image_size=512),
           "bscanlayermap": SemSegInputAdapter(num_classes=13,
                                               patch_size_full=(8, 8),
                                               image_size=128)}
    outs = {d: Ours(num_channels=13 if d == "bscanlayermap" else 1,
                    patch_size_full=(8, 8) if d == "bscanlayermap" else (32, 32),
                    dim_tokens=64, depth=1, num_heads=4, task=d,
                    context_tasks=tuple(domains),
                    image_size=(128, 128) if d == "bscanlayermap" else (512, 512))
            for d in domains}
    core = Core(input_adapters=ins, output_adapters=outs, dim_tokens=192,
                depth=3, num_heads=4)  # 'tiny' preset dims
    params = core.init_params(jax.random.PRNGKey(0))
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_torch(params, core).items()}
    args = SimpleNamespace(model="miragepre_tiny", num_global_tokens=1,
                           drop_path=0.0, in_domains=domains, out_domains=domains,
                           decoder_dim=64, decoder_depth=1, decoder_num_heads=4,
                           decoder_use_task_queries=True, decoder_use_xattn=True)
    ckpt = str(tmp_path / "mirage-tiny.pth")
    torch.save({"model": sd, "args": args}, ckpt)

    x = {"bscan": np.random.default_rng(0).random((8, 1, 512, 512), np.float32)}

    single = MIRAGEWrapper(weights=ckpt)
    want = np.asarray(single(x)["bscan"])

    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    sharded = MIRAGEWrapper(weights=ckpt, mesh=mesh)
    got = np.asarray(sharded(x)["bscan"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_wrapper_multichip_odd_batch(tmp_path):
    """Batch sizes not divisible by data*fsdp (incl. batch 1) pad internally
    and slice back; features() also shards its inputs."""
    import torch

    from types import SimpleNamespace

    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.api.convert import params_to_torch
    from mirage_tpu.api.wrapper import MIRAGEWrapper
    from mirage_tpu.models.mirage import MIRAGEModel as Core

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(32, 32),
                                        image_size=512)}
    core = Core(input_adapters=ins, output_adapters=None, dim_tokens=192,
                depth=3, num_heads=4)
    params = core.init_params(jax.random.PRNGKey(0))
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_torch(params, core).items()}
    args = SimpleNamespace(model="miragepre_tiny", num_global_tokens=1,
                           drop_path=0.0, in_domains=["bscan"],
                           out_domains=[], decoder_dim=64, decoder_depth=1,
                           decoder_num_heads=4, decoder_use_task_queries=True,
                           decoder_use_xattn=True)
    ckpt = str(tmp_path / "mirage-tiny-enc.pth")
    torch.save({"model": sd, "args": args}, ckpt)

    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    w = MIRAGEWrapper(weights=ckpt, modalities="bscan", mesh=mesh,
                      output_adapters=False)
    single = MIRAGEWrapper(weights=ckpt, modalities="bscan",
                           output_adapters=False)
    for batch in (1, 3):
        x = {"bscan": np.random.default_rng(batch).random(
            (batch, 1, 512, 512), np.float32)}
        got = np.asarray(w.features(x))
        want = np.asarray(single.features(x))
        assert got.shape[0] == batch
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
