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


def test_skip_grad_preserves_moments():
    """A skipped step must leave params, Adam moments AND the step count
    untouched (native_scaler.py:24-29 semantics)."""
    import jax.numpy as jnp

    from mirage_tpu.train.optim import GroupedOptimizer, OptimizerConfig

    opt = GroupedOptimizer(OptimizerConfig(opt="adamw", skip_grad=1.0))
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    good = {"w": jnp.full((4, 4), 0.01)}
    params1, state1, _ = opt.update(good, state, params, 1e-2)
    assert not np.allclose(np.asarray(params1["w"]), np.asarray(params["w"]))

    bad = {"w": jnp.full((4, 4), jnp.inf)}
    params2, state2, gnorm = opt.update(bad, state1, params1, 1e-2)
    assert not np.isfinite(float(gnorm))
    np.testing.assert_array_equal(np.asarray(params2["w"]), np.asarray(params1["w"]))
    np.testing.assert_array_equal(np.asarray(state2["mu"]["w"]),
                                  np.asarray(state1["mu"]["w"]))
    np.testing.assert_array_equal(np.asarray(state2["nu"]["w"]),
                                  np.asarray(state1["nu"]["w"]))
    assert int(state2["count"]) == int(state1["count"])
    # recovery: the next good step proceeds normally and stays finite
    params3, state3, _ = opt.update(good, state2, params2, 1e-2)
    assert np.all(np.isfinite(np.asarray(params3["w"])))
    assert int(state3["count"]) == int(state1["count"]) + 1


def test_adam_applies_l2_weight_decay():
    import jax.numpy as jnp

    from mirage_tpu.train.optim import GroupedOptimizer, OptimizerConfig

    params = {"w": jnp.ones((2, 2))}
    grads = {"w": jnp.zeros((2, 2))}
    for opt_name in ("adam", "adamw"):
        opt = GroupedOptimizer(OptimizerConfig(opt=opt_name, weight_decay=0.1))
        _, _, _ = opt.update(grads, opt.init(params), params, 1e-2)
        p2, _, _ = opt.update(grads, opt.init(params), params, 1e-2)
        # zero grads + wd>0 must still shrink the weights
        assert float(p2["w"][0, 0]) < 1.0, opt_name


def test_bn_buffers_frozen():
    import jax.numpy as jnp

    from mirage_tpu.train.optim import GroupedOptimizer, OptimizerConfig

    params = {"head": {"bn": {"scale": jnp.ones(3), "bias": jnp.zeros(3),
                              "mean": jnp.zeros(3), "var": jnp.ones(3)},
                       "conv1": {"w": jnp.ones((3, 3))}}}
    opt = GroupedOptimizer(OptimizerConfig(opt="adamw", weight_decay=0.1))
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    p2, _, _ = opt.update(grads, opt.init(params), params, 1e-2)
    np.testing.assert_array_equal(np.asarray(p2["head"]["bn"]["mean"]),
                                  np.asarray(params["head"]["bn"]["mean"]))
    np.testing.assert_array_equal(np.asarray(p2["head"]["bn"]["var"]),
                                  np.asarray(params["head"]["bn"]["var"]))
    assert not np.allclose(np.asarray(p2["head"]["conv1"]["w"]),
                           np.asarray(params["head"]["conv1"]["w"]))


def test_stop_frozen_grads_match():
    """stop_frozen changes WHERE grads are computed, not their values: the
    trainable leaves' gradients are identical with and without it, and frozen
    leaves get exact zeros."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.train.optim import GroupedOptimizer, OptimizerConfig

    params = {"encoder": {"w": jnp.arange(4.0).reshape(2, 2)},
              "head": {"w": jnp.ones((2, 2))}}
    opt = GroupedOptimizer(OptimizerConfig(opt="adamw", frozen_paths=("encoder",)))
    x = jnp.asarray([[1.0, 2.0]])

    def loss(p):
        return jnp.sum((x @ p["encoder"]["w"] @ p["head"]["w"]) ** 2)

    g_plain = jax.grad(loss)(params)
    g_frozen = jax.grad(lambda p: loss(opt.stop_frozen(p)))(params)
    np.testing.assert_allclose(np.asarray(g_frozen["head"]["w"]),
                               np.asarray(g_plain["head"]["w"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(g_frozen["encoder"]["w"]), 0.0)


def test_frozen_encoder_output_stopgrad_preserves_head_grads():
    """forward_light(frozen_encoder=True) must not change forward values or
    the trainable head's gradients — it only lets XLA drop the dead
    backward-through-encoder scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirage_tpu.adapters import LinearSegAdapter, PatchedInputAdapter
    from mirage_tpu.models.mirage import MIRAGEModel

    model = MIRAGEModel(
        input_adapters={"bscan": PatchedInputAdapter(
            num_channels=1, patch_size_full=(16, 16), image_size=64)},
        output_adapters={"semseg": LinearSegAdapter(
            num_classes=5, patch_size=16, main_tasks=("bscan",),
            task="semseg", image_size=(64, 64))},
        dim_tokens=96, depth=2, num_heads=4)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 64, 64)),
                    jnp.float32)

    def loss(p, frozen):
        frozen_tree = {"input_adapters": jax.lax.stop_gradient(p["input_adapters"]),
                       "encoder": jax.lax.stop_gradient(p["encoder"]),
                       "global_tokens": jax.lax.stop_gradient(p["global_tokens"]),
                       "output_adapters": p["output_adapters"]}
        preds = model.forward_light(frozen_tree, {"bscan": x},
                                    frozen_encoder=frozen)
        return jnp.sum(preds["semseg"].astype(jnp.float32) ** 2) / 1e3

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0["output_adapters"])[0],
            jax.tree_util.tree_flatten_with_path(g1["output_adapters"])[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pth))


def test_fused_adamw_kernel_matches_xla():
    """The one-pass fused AdamW leaf kernel (ops/fused_adamw.py, routed for
    big aligned leaves) must match the tree_map XLA path — incl. clip_grad
    scaling, decoupled wd, bias correction, and the skip_grad blend."""
    from mirage_tpu.ops import fused_adamw as fa
    from mirage_tpu.ops import runtime as rt

    rng = np.random.default_rng(0)
    # big enough (>= fa._MIN_ELEMS) and 512-divisible to route; plus a
    # small leaf that stays XLA either way
    params = {"enc": {"w": jnp.asarray(rng.standard_normal((2, 512, 512)),
                                       jnp.float32)},
              "head": {"b": jnp.asarray(rng.standard_normal((7,)),
                                        jnp.float32)}}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 3, jnp.float32),
        params)
    cfg = OptimizerConfig(opt="adamw", betas=(0.9, 0.95), weight_decay=0.05,
                          clip_grad=1.0, skip_grad=100.0)
    opt = create_optimizer(cfg)
    state = opt.init(params)

    fa.reset_routed_count()  # earlier tests (kernel_sharding) may have routed
    prev_enabled = fa.enabled()
    fa.set_enabled(False)
    p_x, s_x, gn_x = jax.jit(lambda: opt.update(grads, state, params, 1e-2))()
    assert fa.last_routed_count() == 0

    fa.reset_routed_count()
    try:
        with rt.forced("interpret"):
            fa.set_enabled(True)
            p_k, s_k, gn_k = jax.jit(
                lambda: opt.update(grads, state, params, 1e-2))()
    finally:
        fa.set_enabled(prev_enabled)
    assert fa.last_routed_count() == 1  # only the big leaf routed

    for a, b in zip(jax.tree_util.tree_leaves((p_x, s_x["mu"], s_x["nu"])),
                    jax.tree_util.tree_leaves((p_k, s_k["mu"], s_k["nu"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert float(gn_x) == float(gn_k)

    # skip_grad blend inside the kernel: exploding grads leave everything
    # untouched through the kernel route too
    bad = jax.tree_util.tree_map(lambda g: g * 1e6, grads)
    with rt.forced("interpret"):
        p_b, s_b, _ = jax.jit(lambda: opt.update(bad, state, params, 1e-2))()
    np.testing.assert_array_equal(np.asarray(p_b["enc"]["w"]),
                                  np.asarray(params["enc"]["w"]))
    np.testing.assert_array_equal(np.asarray(s_b["nu"]["enc"]["w"]),
                                  np.asarray(state["nu"]["enc"]["w"]))
