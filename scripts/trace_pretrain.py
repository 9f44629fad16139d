"""Trace the pretraining train step; print top device ops."""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_mirage
from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.steps import (init_train_state, make_pretrain_loss,
                                    make_train_step)

model = _build_mirage("base", img=512, layermap=128, compute_dtype=jnp.bfloat16)
object.__setattr__(model, "remat", True)
params = model.init_params(jax.random.PRNGKey(0))
opt = create_optimizer(OptimizerConfig(
    opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
dc = {"bscan": {"loss": "mse", "patch_size": 32, "norm_pix": True},
      "slo": {"loss": "mse", "patch_size": 32, "norm_pix": True},
      "bscanlayermap": {"loss": "ce", "patch_size": 8}}
loss_fn = make_pretrain_loss(model, dc, num_encoded_tokens=98, alphas=1.0,
                             sample_tasks_uniformly=False)
step = make_train_step(loss_fn, opt)
B = 256
rng = np.random.default_rng(0)
batch = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "bscanlayermap": jnp.asarray(rng.integers(0, 13, (B, 128, 128)), jnp.int32)}
state = init_train_state(params, opt)
state, m = step(state, batch, jax.random.PRNGKey(0), 1e-4, 1.0)
float(m["loss"])
tracedir = "/tmp/mirage_prof_pre"
os.system(f"rm -rf {tracedir}")
with jax.profiler.trace(tracedir):
    for i in range(2):
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i), 1e-4, 1.0)
    float(m["loss"])

from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = sorted(glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if plane.name != "/device:TPU:0":
        continue
    ev_meta = {m_.id: m_.name for m_ in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot, n = collections.Counter(), collections.Counter()
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps
            n[name] += 1
        print(f"total events {len(line.events)}")
        print(f"sum of all op self-times: {sum(tot.values())/1e9/2:.1f} ms/step")
        for name, ps in tot.most_common(60):
            print(f"{ps/1e9/2:9.3f} ms x{n[name]:4d}  {name[:100]}", flush=True)
