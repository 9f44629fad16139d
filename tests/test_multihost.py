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


def test_two_process_global_batch_step(tmp_path):
    port = _free_port()
    worker = Path(__file__).parent / "_multihost_worker.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    exp_loss, exp_w0 = _expected_single_process()
    for pid, out in enumerate(outs):
        loss = float([l for l in out.splitlines() if l.startswith("LOSS")][0].split()[1])
        w0 = float([l for l in out.splitlines() if l.startswith("W0")][0].split()[1])
        np.testing.assert_allclose(loss, exp_loss, rtol=1e-5,
                                   err_msg=f"worker {pid} loss")
        np.testing.assert_allclose(w0, exp_w0, rtol=1e-5,
                                   err_msg=f"worker {pid} updated param")
