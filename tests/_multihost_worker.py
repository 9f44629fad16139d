"""Worker process for tests/test_multihost.py.

One of two jax.distributed CPU processes (4 virtual devices each -> 8 global).
Loads its per-host DataLoader stripe, assembles the logically-global batch via
train.steps.shard_batch's process_count()>1 branch
(make_array_from_process_local_data over DCN, SURVEY.md §2.5), runs ONE real
train step on the 8-device global mesh, prints the loss.

Importable without side effects (the test imports SynthRegression); the
distributed setup only runs under __main__.
"""

import numpy as np


class SynthRegression:
    """16 deterministic (x, y) samples shared by every process."""

    def __len__(self):
        return 16

    def __getitem__(self, item):
        i, _rng = item if isinstance(item, tuple) else (item, None)
        g = np.random.default_rng(1000 + int(i))
        x = g.random((4,)).astype(np.float32)
        y = np.float32(x.sum())
        return {"x": x, "y": y}


class SynthMirage:
    """16 deterministic three-modality pretraining samples shared by every
    process (real-model multi-host test, VERDICT r3 weak #4)."""

    def __len__(self):
        return 16

    def __getitem__(self, item):
        i, _rng = item if isinstance(item, tuple) else (item, None)
        g = np.random.default_rng(2000 + int(i))
        return {
            "bscan": g.random((1, 128, 128)).astype(np.float32),
            "slo": g.random((1, 128, 128)).astype(np.float32),
            "bscanlayermap": g.integers(0, 13, (32, 32)).astype(np.int32),
        }


def main_mirage(port: str, pid: int):
    """Two-process dp shard_map pretraining step on a REAL tiny MIRAGEModel
    (Dirichlet masking, three adapters, masked MSE+CE, AdamW): the
    process_count()>1 branch with the actual model pytree. The same step on
    a single 8-virtual-device process is bitwise-comparable (the dp step's
    fold_in(axis_index) draws don't depend on the process layout)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8

    import os
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_parallel import DOMAIN_CONF, tiny_pretrain_model

    from mirage_tpu.data.loader import DataLoader
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch,
                                        shard_state)

    mesh = make_mesh()  # dp over all 8 global devices -> shard_map step
    loader = DataLoader(SynthMirage(), batch_size=8, shuffle=False,
                        num_workers=1, shard_index=pid, num_shards=2)
    local = next(iter(loader))
    assert local["bscan"].shape == (8, 1, 128, 128)

    model = tiny_pretrain_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    state = shard_state(init_train_state(params, opt), mesh)
    gbatch = shard_batch(local, mesh)  # process_count()>1 branch
    assert gbatch["bscan"].shape == (16, 1, 128, 128)  # logically global
    with mesh:
        state, metrics = step(state, gbatch, jax.random.PRNGKey(0), 1e-4, 1.0)
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)
    print(f"GNORM {float(metrics['grad_norm']):.8f}", flush=True)
    leaf = np.asarray(jax.device_get(
        state["params"]["encoder"]["attn"]["qkv"]["w"]))
    print(f"W0 {float(leaf.ravel()[0]):.8f}", flush=True)


def main_tpfsdp(port: str, pid: int):
    """Two-process COMPOSED Megatron-TP x ZeRO-FSDP step on the full
    (data=2, fsdp=2, tensor=2) mesh: per-host stripes feed the global
    batch, encoder weights shard over both model axes across the two
    processes, fsdp all_gathers and tensor psums ride the (virtual) DCN.
    Same comparability argument as main_mirage: the rng folds by the
    ('data','fsdp') index, not the process layout."""
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_parallel import DOMAIN_CONF, tiny_pretrain_model

    from mirage_tpu.data.loader import DataLoader
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch,
                                        shard_state)

    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    loader = DataLoader(SynthMirage(), batch_size=8, shuffle=False,
                        num_workers=1, shard_index=pid, num_shards=2)
    local = next(iter(loader))

    model = dataclasses.replace(tiny_pretrain_model(), tp=("tensor", 2))
    params = tiny_pretrain_model().init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False, tp=True)
    state = shard_state(init_train_state(params, opt), mesh,
                        tp_num_heads=model.num_heads)
    gbatch = shard_batch(local, mesh)
    assert gbatch["bscan"].shape == (16, 1, 128, 128)
    with mesh:
        state, metrics = step(state, gbatch, jax.random.PRNGKey(0), 1e-4, 1.0)
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)
    print(f"GNORM {float(metrics['grad_norm']):.8f}", flush=True)
    # encoder weights are sharded across processes (not host-addressable
    # whole); compare a replicated leaf — global_tokens trains through the
    # full encoder backward, so it pins the cross-process grad flow
    leaf = np.asarray(jax.device_get(state["params"]["global_tokens"]))
    print(f"W0 {float(leaf.ravel()[0]):.8f}", flush=True)
    # the checkpoint save path: state_to_host must gather the
    # cross-process-sharded leaves collectively (plain device_get raises
    # on them) — every process receives the full value
    from mirage_tpu.train.checkpoint import state_to_host

    host = state_to_host(state)
    qkv = np.asarray(host["params"]["encoder"]["attn"]["qkv"]["w"])
    assert qkv.shape == state["params"]["encoder"]["attn"]["qkv"]["w"].shape
    print(f"QKV0 {float(qkv.ravel()[0]):.8f}", flush=True)


def main(port: str, pid: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from mirage_tpu.data.loader import DataLoader
    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_train_step,
                                        shard_batch, shard_state)

    mesh = make_mesh()  # pure data parallelism over all 8 global devices
    loader = DataLoader(SynthRegression(), batch_size=8, shuffle=False,
                        num_workers=1, shard_index=pid, num_shards=2)
    local = next(iter(loader))
    assert local["x"].shape == (8, 4)  # this host's stripe of the 16 batch

    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.0))
    params = {"w": jnp.zeros((4,), jnp.float32)}

    def loss_fn(p, batch, rng):
        pred = batch["x"] @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    step = make_train_step(loss_fn, opt)
    state = shard_state(init_train_state(params, opt), mesh)
    gbatch = shard_batch(local, mesh)  # process_count()>1 branch
    assert gbatch["x"].shape == (16, 4)  # logically global
    with mesh:
        state, metrics = step(state, gbatch, jax.random.PRNGKey(0), 1e-2, 1.0)
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)
    w0 = float(np.asarray(jax.device_get(state["params"]["w"]))[0])
    print(f"W0 {w0:.8f}", flush=True)


if __name__ == "__main__":
    import os
    import sys

    port, pid = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "synth"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    {"mirage": main_mirage, "tpfsdp": main_tpfsdp}.get(mode, main)(port, pid)
