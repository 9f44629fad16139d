"""AOT TPU-platform export checks for the kernel ∘ shard_map composition
(no chip needed — jax.export serializes real Mosaic kernels).

Covers what tests/test_kernel_sharding.py's forward export doesn't:
- the dp shard_map TRAIN step (Pallas backward kernels + psum/pmean
  collectives + optimizer) at a kernel-gated shape;
- flash attention fwd+bwd (>=512 keys — the seg encoder shape) inside
  shard_map;
- the composed Megatron-TP x ZeRO-FSDP step at the REAL ViT-B width
  (768/12 heads) on a (data=2, fsdp=2, tensor=2) mesh — the program a
  pod would compile for 3-axis training, kernels engaged.

Prints the tpu_custom_call count per module. Run: python scripts/export_check.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mirage_tpu.ops import runtime


def absify(tree, mesh, spec_fn):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, spec_fn(a))), tree)


def check_train_step():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_kernel_sharding import DOMAIN_CONF, kernel_model, make_batch

    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    model = kernel_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    mesh = make_mesh({"data": 8})
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    state = init_train_state(params, opt)
    batch = make_batch(8)

    with runtime.forced("force"):
        exp = jax.export.export(step, platforms=("tpu",))(
            absify(state, mesh, lambda a: P()),
            absify(batch, mesh, lambda a: P(("data", "fsdp"))),
            jax.ShapeDtypeStruct((2,), jnp.uint32,
                                 sharding=NamedSharding(mesh, P())),
            jax.ShapeDtypeStruct((), jnp.float32,
                                 sharding=NamedSharding(mesh, P())),
            jax.ShapeDtypeStruct((), jnp.float32,
                                 sharding=NamedSharding(mesh, P())))
    n = exp.mlir_module().count("tpu_custom_call")
    print(f"dp shard_map TRAIN step export: OK, tpu_custom_call x{n}")
    assert n >= 3, "expected fwd + bwd Mosaic kernels in the train step"


def check_flash_shard_map():
    from mirage_tpu.nn.attention import sdpa
    from mirage_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 8})
    B, H, N, DH = 8, 12, 1025, 64

    def f(q, k, v):
        def loss(q):
            return jnp.sum(sdpa(q, k, v, DH ** -0.5, impl="flash")
                           .astype(jnp.float32))
        l, g = jax.value_and_grad(loss)(q)
        return jax.lax.pmean(l, "data"), g

    sm = jax.shard_map(f, mesh=mesh,
                       in_specs=(P("data"),) * 3,
                       out_specs=(P(), P("data")), check_vma=False)
    x = jax.ShapeDtypeStruct((B, H, N, DH), jnp.bfloat16,
                             sharding=NamedSharding(mesh, P("data")))
    with runtime.forced("force"):
        exp = jax.export.export(jax.jit(sm), platforms=("tpu",))(x, x, x)
    n = exp.mlir_module().count("tpu_custom_call")
    print(f"flash fwd+bwd (N={N}) shard_map export: OK, tpu_custom_call x{n}")
    assert n >= 2


def check_tp_fsdp_step_base_width():
    """Composed TP x ZeRO step at the real ViT-B width (the sharding-
    relevant dimension): export for platform 'tpu' must lower the Mosaic
    kernels inside the manually-partitioned 3-axis module."""
    import dataclasses

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_kernel_sharding import DOMAIN_CONF, make_batch

    import __graft_entry__
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.parallel.tp import tp_fsdp_specs, tp_relayout_state
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step)

    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    model = dataclasses.replace(
        __graft_entry__._build_mirage("base_shallow", img=128, layermap=32),
        tp=("tensor", 2))
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False, tp=True)
    state = tp_relayout_state(init_train_state(params, opt),
                              model.num_heads, 2)
    specs = tp_fsdp_specs(state["params"], mesh)

    def abs_spec(tree, spec_tree):
        return jax.tree_util.tree_map(
            lambda a, sp: jax.ShapeDtypeStruct(
                a.shape, a.dtype,
                sharding=NamedSharding(
                    mesh, sp if getattr(a, "ndim", 0) == len(sp) else P())),
            tree, spec_tree)

    state_abs = {
        "params": abs_spec(state["params"], specs),
        "opt": {"mu": abs_spec(state["opt"]["mu"], specs),
                "nu": abs_spec(state["opt"]["nu"], specs),
                "count": jax.ShapeDtypeStruct(
                    (), jnp.int32, sharding=NamedSharding(mesh, P()))},
        "step": jax.ShapeDtypeStruct((), jnp.int32,
                                     sharding=NamedSharding(mesh, P())),
    }
    batch_abs = absify(make_batch(8), mesh, lambda a: P(
        ("data", "fsdp"), *([None] * (a.ndim - 1))))
    scal = lambda: jax.ShapeDtypeStruct((), jnp.float32,  # noqa: E731
                                        sharding=NamedSharding(mesh, P()))
    with runtime.forced("force"):
        jf = step.build(state_abs, batch_abs)
        exp = jax.export.export(jf, platforms=("tpu",))(
            state_abs, batch_abs,
            jax.ShapeDtypeStruct((2,), jnp.uint32,
                                 sharding=NamedSharding(mesh, P())),
            scal(), scal())
    n = exp.mlir_module().count("tpu_custom_call")
    print(f"composed TPxZeRO step export (ViT-B width): OK, "
          f"tpu_custom_call x{n}")
    assert n >= 2


if __name__ == "__main__":
    check_train_step()
    check_flash_shard_map()
    check_tp_fsdp_step_base_width()
    print("EXPORT CHECKS OK")
