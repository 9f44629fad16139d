"""Trace the seg-tuning train step; print top device ops."""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.adapters import ConvNeXtAdapter, PatchedInputAdapter
from mirage_tpu.losses import ce_gdice_loss
from mirage_tpu.models.mirage import MIRAGEModel
from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.steps import init_train_state, make_train_step

model = MIRAGEModel(
    input_adapters={"bscan": PatchedInputAdapter(
        num_channels=1, patch_size_full=(32, 32), image_size=1024)},
    output_adapters={"semseg": ConvNeXtAdapter(
        num_classes=8, patch_size=32, preds_per_patch=16, depth=4,
        embed_dim=6144, main_tasks=("bscan",), task="semseg",
        image_size=(1024, 1024))},
    dim_tokens=768, depth=12, num_heads=12, drop_path_rate=0.1,
    compute_dtype=jnp.bfloat16)
parity = "parity" in sys.argv[1:]  # reference freeze (adapters train) vs fast
params = model.init_params(jax.random.PRNGKey(0))
opt = create_optimizer(OptimizerConfig(
    opt="adamw", weight_decay=0.05, layer_decay=0.75,
    num_layers=model.depth, freeze_encoder=True,
    frozen_paths=() if parity else ("input_adapters", "global_tokens")))

def loss_fn(p, batch, rng):
    preds = model.forward_light(p, {"bscan": batch["bscan"]},
                                deterministic=False, rng=rng,
                                frozen_encoder=not parity)
    return ce_gdice_loss(preds["semseg"].astype(jnp.float32),
                         batch["semseg"]), {}

step = make_train_step(loss_fn, opt)
B = 8
rng = np.random.default_rng(0)
batch = {"bscan": jnp.asarray(rng.random((B, 1, 1024, 1024)), jnp.float32),
         "semseg": jnp.asarray(rng.integers(0, 8, (B, 1024, 1024)), jnp.int32)}
state = init_train_state(params, opt)
state, m = step(state, batch, jax.random.PRNGKey(0), 1e-4, 1.0)
float(m["loss"])
tracedir = "/tmp/mirage_prof_seg"
os.system(f"rm -rf {tracedir}")
with jax.profiler.trace(tracedir):
    for i in range(3):
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
        for name, ps in tot.most_common(24):
            print(f"{ps/1e9/3:9.3f} ms x{n[name]:4d}  {name[:100]}", flush=True)
