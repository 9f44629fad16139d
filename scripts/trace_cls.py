"""Trace the cls linear-probe step; print top device ops."""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.adapters import PatchedInputAdapter
from mirage_tpu.models.mirage import MIRAGEModel
from mirage_tpu.losses.gdice import cross_entropy_loss
from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear
from mirage_tpu.train.optim import OptimizerConfig, create_optimizer
from mirage_tpu.train.steps import init_train_state

core = MIRAGEModel(
    input_adapters={"bscan": PatchedInputAdapter(
        num_channels=1, patch_size_full=(32, 32), image_size=512)},
    output_adapters=None, dim_tokens=768, depth=12, num_heads=12,
    compute_dtype=jnp.bfloat16)
params = {"model": core.init_params(jax.random.PRNGKey(0)),
          "norm": layer_norm_init(768),
          "head": {"w": jnp.zeros((768, 5)), "b": jnp.zeros((5,))}}
opt = create_optimizer(OptimizerConfig(
    opt="adamw", weight_decay=1e-2, frozen_paths=("model", "norm")))

def apply(p, x, rng):
    tokens = core.forward_light(p["model"], {"bscan": x},
                                deterministic=False, rng=rng,
                                frozen_encoder=True)
    pooled = layer_norm(p["norm"], tokens)[:, :-1].mean(axis=1)
    return linear(p["head"], pooled.astype(jnp.float32))

@jax.jit
def step(state, batch, rng, lr, wdm):
    def wrapped(p):
        logits = apply(opt.stop_frozen(p), batch["x"], rng)
        return cross_entropy_loss(logits[..., None, None],
                                  batch["y"][..., None, None],
                                  label_smoothing=0.1), {}
    (loss, _), grads = jax.value_and_grad(wrapped, has_aux=True)(state["params"])
    params_, opt_state, gnorm = opt.update(grads, state["opt"], state["params"], lr)
    return ({"params": params_, "opt": opt_state, "step": state["step"] + 1},
            {"loss": loss, "grad_norm": gnorm})

B = 64
rng = np.random.default_rng(0)
batch = {"x": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "y": jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)}
state = init_train_state(params, opt)
state, m = step(state, batch, jax.random.PRNGKey(0), 1e-3, 1.0)
float(m["loss"])
tracedir = "/tmp/mirage_prof_cls"
os.system(f"rm -rf {tracedir}")
with jax.profiler.trace(tracedir):
    for i in range(3):
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i), 1e-3, 1.0)
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
        for name, ps in tot.most_common(20):
            print(f"{ps/1e9/3:9.3f} ms x{n[name]:4d}  {name[:100]}", flush=True)
