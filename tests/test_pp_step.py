"""GPipe pipeline-parallel train step (train/steps._make_pp_train_step +
parallel/pp.py).

Completes the parallelism family (dp / ZeRO-FSDP / Megatron-TP / TP×ZeRO /
pipeline) with the encoder-depth axis: stacked encoder leaves shard over
'pipe' on the layer axis, the forward is a GPipe tick scan (stage-local
encoder stacks + one ppermute rotation per tick, masked-psum output
broadcast), backward is pure autodiff. These tests pin:

- pp step == dp step on the same data shards, with the REAL kernel code
  (interpret mode) — the 1/S loss scaling + psum('pipe') grad bookkeeping
  derived in parallel/pp.py is exactly the replicated-math answer.
- state placement: shard_state shards every stacked encoder leaf (and its
  Adam moments) over 'pipe' on axis 0.
- AOT export for platform 'tpu' lowers the real Mosaic kernels inside the
  manually-partitioned pipeline step.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mirage_tpu.ops import runtime
from mirage_tpu.parallel.mesh import make_mesh
from mirage_tpu.parallel.pp import pp_param_specs
from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.steps import (
    init_train_state,
    make_pretrain_loss,
    make_train_step,
    shard_batch,
    shard_state,
)
from tests.test_kernel_sharding import DOMAIN_CONF, kernel_model, make_batch


def _steps(mesh, model, opt, batch, rng, n=2, pp=False):
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False, pp=pp)
    params = model.init_params(jax.random.PRNGKey(0))
    state = shard_state(init_train_state(params, opt), mesh)
    sb = shard_batch(batch, mesh)
    with mesh:
        for i in range(n):
            state, metrics = step(state, sb, jax.random.fold_in(rng, i),
                                  1e-3, 1.0)
    return state, metrics


def test_pp_step_matches_dp_step_kernels_interpret():
    """Two steps on a (data=4, pipe=2) mesh (depth-2 encoder → 1 layer per
    stage, n_micro=2 over the local batch of 2) == two steps on a (data=4)
    mesh with the plain scan encoder: both fold the rng by the same
    ('data','fsdp') index over the same batch shards, so the math is
    identical — the pipeline only reorders the per-microbatch compute and
    where the layer weights live. Runs the REAL kernel code (interpret)
    incl. the Pallas backwards through the tick scan's ppermute."""
    batch = make_batch(8)
    rng = jax.random.PRNGKey(3)
    model_dp = kernel_model()
    model_pp = dataclasses.replace(model_dp, pp=("pipe", 2))

    with runtime.forced("interpret"):
        opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                               clip_grad=1.0))
        st_dp, m_dp = _steps(
            make_mesh({"data": 4}, devices=jax.devices()[:4]),
            model_dp, opt, batch, rng)
        st_p, m_p = _steps(
            make_mesh({"data": 4, "pipe": 2}), model_pp, opt, batch, rng,
            pp=True)

    assert np.isfinite(float(m_p["loss"]))
    np.testing.assert_allclose(float(m_p["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_p["grad_norm"]),
                               float(m_dp["grad_norm"]), rtol=1e-4)
    # atol: unlike FSDP (pure storage sharding, identical trace), the
    # pipeline genuinely reorders float reductions (microbatched dW sums
    # accumulate across scan ticks), and Adam's scale-free update amplifies
    # that noise on near-zero-grad bias leaves (update ≈ mhat/eps). Measured
    # worst case 2.8e-5 on eps-regime kv biases; loss is bitwise equal and
    # gnorm matches to 1e-7 relative.
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(st_p["params"])[0],
            jax.tree_util.tree_flatten_with_path(st_dp["params"])[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=6e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_state_is_actually_sharded():
    """shard_state on a pipe mesh: every stacked encoder leaf lands sharded
    over 'pipe' on axis 0 (per-device layer count = depth/pipe), everything
    else replicated; moments follow params."""
    mesh = make_mesh({"data": 4, "pipe": 2})
    model = kernel_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw"))
    state = shard_state(init_train_state(params, opt), mesh)

    specs = pp_param_specs(params, mesh)
    n_sharded = 0
    for tree in (state["params"], state["opt"]["mu"]):
        for (path, leaf), sp in zip(
                jax.tree_util.tree_flatten_with_path(tree)[0],
                jax.tree_util.tree_leaves(specs)):
            if not getattr(leaf, "ndim", 0):
                continue  # frozen-moment scalar placeholders
            shard_shape = leaf.sharding.shard_shape(leaf.shape)
            if sp and "pipe" in sp:
                n_sharded += 1
                assert shard_shape[0] == leaf.shape[0] // 2, \
                    jax.tree_util.keystr(path)
            else:
                assert shard_shape == leaf.shape, jax.tree_util.keystr(path)
    assert n_sharded >= 12  # all stacked encoder leaves, params + mu


def test_pp_step_rejects_unflagged_mesh_and_composition():
    """pipe>1 without pp=True is an error (no GSPMD fallback exists for the
    'pipe' axis); pipe x tensor composition is rejected by the builder."""
    model = kernel_model()
    opt = create_optimizer(OptimizerConfig(opt="adamw"))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    with pytest.raises(ValueError, match="pipe"):
        make_train_step(loss_fn, opt, mesh=make_mesh({"data": 4, "pipe": 2}))
    with pytest.raises(AssertionError, match="pipeline"):
        make_train_step(loss_fn, opt, pp=True,
                        mesh=make_mesh({"data": 2, "tensor": 2, "pipe": 2}))
    with pytest.raises(AssertionError, match="layer_decay"):
        make_train_step(
            loss_fn,
            create_optimizer(OptimizerConfig(
                opt="adamw", layer_decay=0.75, num_layers=model.depth)),
            mesh=make_mesh({"data": 4, "pipe": 2}), pp=True)
    # a model carrying both tp and pp fails loudly at the routing guard,
    # not with a shape error deep in attention
    both = dataclasses.replace(model, pp=("pipe", 2), tp=("tensor", 2))
    params = both.init_params(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="one of tp/pp"):
        both._encoder(params["encoder"], jnp.zeros((2, 8, 128)),
                      deterministic=True, rng=None)


def test_pretraining_cli_rejects_bad_pp_microbatches(tmp_path, monkeypatch):
    """An explicit --pp_microbatches that is not a positive divisor of the
    local batch is a startup error, never a silent override (and never a
    negative-dimension reshape crash inside jit). The depth-indivisible
    tiny preset is also rejected, before the microbatch check."""
    from mirage_tpu.cli import run_pretraining
    from mirage_tpu.models.mirage import MIRAGEModel, model_factory

    def _tiny4(input_adapters, output_adapters, **kw):
        return MIRAGEModel(input_adapters=input_adapters,
                           output_adapters=output_adapters,
                           dim_tokens=192, depth=4, num_heads=4, mlp_ratio=4,
                           qkv_bias=True, **kw)

    monkeypatch.setitem(model_factory, "miragepre_tiny4", _tiny4)

    def run(model, extra):
        run_pretraining.main([
            "--in_domains", "bscan", "--out_domains", "bscan",
            "--model", model, "--batch_size", "8", "--mesh_pipe", "2",
            "--data_path", str(tmp_path / "missing"),
            "--output_dir", str(tmp_path / "out"),
        ] + extra)

    for bad in ("6", "-1"):
        with pytest.raises(SystemExit, match="divisor"):
            run("miragepre_tiny4", ["--pp_microbatches", bad])
    with pytest.raises(SystemExit, match="depth"):
        run("miragepre_tiny", [])  # depth 3 % pipe 2


def test_pretraining_cli_pipe_mesh(tmp_path, monkeypatch):
    """End-to-end CLI drive of --mesh_pipe: a (data=4, pipe=2) mesh on the
    8 virtual devices routes through the GPipe shard_map step, saves a
    checkpoint with FULL-depth stacked encoder leaves (state_to_host
    gathers the pipe shards), and auto-resumes back onto the pipe mesh.
    The tiny preset is depth 3 (indivisible by 2), so a depth-4 variant is
    registered for the test."""
    import json

    from mirage_tpu.cli import run_pretraining
    from mirage_tpu.models.mirage import MIRAGEModel, model_factory
    from tests.test_pretrain_cli import _make_data

    def _tiny4(input_adapters, output_adapters, **kw):
        return MIRAGEModel(input_adapters=input_adapters,
                           output_adapters=output_adapters,
                           dim_tokens=192, depth=4, num_heads=4, mlp_ratio=4,
                           qkv_bias=True, **kw)

    monkeypatch.setitem(model_factory, "miragepre_tiny4", _tiny4)

    rng = np.random.default_rng(2)
    data = tmp_path / "data"
    _make_data(data, rng)
    out = tmp_path / "out"
    common = [
        "--in_domains", "bscan-slo-bscanlayermap",
        "--out_domains", "bscan-slo-bscanlayermap",
        "--model", "miragepre_tiny4", "--decoder_dim", "64",
        "--decoder_depth", "1", "--decoder_num_heads", "4",
        "--input_size", "64", "--patch_size", "8",
        "--num_encoded_tokens", "48",
        "--warmup_epochs", "1", "--batch_size", "8", "--lr", "1e-3",
        "--save_ckpt_freq", "1", "--num_workers", "0", "--use_cache",
        "--dtype", "float32", "--data_path", str(data),
        "--output_dir", str(out),
        "--mesh_pipe", "2",
    ]
    run_pretraining.main(common + ["--epochs", "1"])
    assert (out / "checkpoint-0").is_dir()
    log = (out / "log.txt").read_text().strip().splitlines()
    assert np.isfinite(json.loads(log[-1])["train_loss"])

    # the saved checkpoint must be mesh-agnostic: full-depth stacked leaves
    from mirage_tpu.train import checkpoint as ckpt
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state

    model = _tiny4(*_cli_adapters(run_pretraining))
    tmpl = init_train_state(
        model.init_params(jax.random.PRNGKey(0)),
        create_optimizer(OptimizerConfig(opt="adamw")))
    restored, epoch = ckpt.auto_load_checkpoint(str(out), tmpl)
    assert epoch == 1
    assert restored["params"]["encoder"]["attn"]["qkv"]["w"].shape[0] == 4

    # auto-resume back onto the pipe mesh
    run_pretraining.main(common + ["--epochs", "2"])
    assert (out / "checkpoint-1").is_dir()


def _cli_adapters(run_pretraining):
    """Input/output adapters matching the CLI flags in the pipe smoke."""
    from mirage_tpu.adapters import (PatchedInputAdapter, SemSegInputAdapter,
                                     SpatialOutputAdapter)

    domains = ("bscan", "slo", "bscanlayermap")
    ins = {
        "bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(8, 8),
                                     image_size=64),
        "slo": PatchedInputAdapter(num_channels=1, patch_size_full=(8, 8),
                                   image_size=64),
        "bscanlayermap": SemSegInputAdapter(num_classes=13,
                                            patch_size_full=(8, 8),
                                            image_size=64, dim_class_emb=64),
    }
    outs = {
        d: SpatialOutputAdapter(
            num_channels=13 if d == "bscanlayermap" else 1,
            patch_size_full=(8, 8), dim_tokens=64, depth=1, num_heads=4,
            task=d, context_tasks=domains, use_task_queries=True,
            use_xattn=True, image_size=(64, 64))
        for d in domains
    }
    return ins, outs


def test_pp_step_tpu_export_lowers_mosaic_kernels():
    """AOT-lower the pipeline shard_map step for platform 'tpu' with the
    real Mosaic kernels (mode 'force'): export must succeed and the module
    must contain tpu_custom_calls — the kernels ARE engaged on the
    pipe-sharded path a pod would run."""
    mesh = make_mesh({"data": 4, "pipe": 2})
    model = dataclasses.replace(kernel_model(), pp=("pipe", 2))
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False, pp=True)
    state = init_train_state(params, opt)
    batch = make_batch(8)

    specs = pp_param_specs(params, mesh)

    def absify(tree, spec_tree):
        def one(a, sp):
            sp = sp if getattr(a, "ndim", 0) >= len(sp) else P()
            return jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(mesh, sp))
        return jax.tree_util.tree_map(one, tree, spec_tree)

    state_abs = {
        "params": absify(state["params"], specs),
        "opt": {
            "mu": absify(state["opt"]["mu"], specs),
            "nu": absify(state["opt"]["nu"], specs),
            "count": jax.ShapeDtypeStruct((), jnp.int32,
                                          sharding=NamedSharding(mesh, P())),
        },
        "step": jax.ShapeDtypeStruct((), jnp.int32,
                                     sharding=NamedSharding(mesh, P())),
    }
    batch_abs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=NamedSharding(mesh, P(
                ("data", "fsdp"), *([None] * (a.ndim - 1))))), batch)
    scal = lambda dt: jax.ShapeDtypeStruct((), dt,
                                           sharding=NamedSharding(mesh, P()))
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))

    with runtime.forced("force"):
        jf = step.build(state_abs, batch_abs)
        exp = jax.export.export(jf, platforms=("tpu",))(
            state_abs, batch_abs, rng_abs, scal(jnp.float32),
            scal(jnp.float32))
    txt = exp.mlir_module()
    assert txt.count("tpu_custom_call") >= 2, \
        "expected Mosaic kernels inside the manually partitioned pipeline step"
