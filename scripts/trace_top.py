"""Capture an xplane trace of the bench.py headline step and print top
device ops — the inference equivalent of trace_pretrain.py (VERDICT r4
weak #6: account the flagship step's residual per component, as done for
training). Usage: python scripts/trace_top.py [batch] (default 512, the
headline batch)."""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from __graft_entry__ import _build_mirage
    model = _build_mirage("large", img=512, layermap=128, compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.zeros((B, 1, 512, 512), jnp.float32),
         "bscanlayermap": jnp.zeros((B, 128, 128), jnp.int32)}
    masks = {"bscan": jnp.zeros((B, 256), jnp.int32),
             "slo": jnp.ones((B, 256), jnp.int32),
             "bscanlayermap": jnp.ones((B, 256), jnp.int32)}

    @jax.jit
    def fwd(params, x, masks, acc):
        preds, _ = model(params, x, mask_inputs=False, task_masks=masks,
                         num_visible=256, deterministic=True,
                         absent_tasks=("slo", "bscanlayermap"))
        return acc + sum(jnp.sum(p.astype(jnp.float32)) for p in preds.values())

    float(fwd(params, x, masks, jnp.zeros(())))
    tracedir = "/tmp/mirage_prof2"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        acc = jnp.zeros(())
        for _ in range(3):
            acc = fwd(params, x, masks, acc)
        float(acc)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot, n = collections.Counter(), collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                n[name] += 1
            total_ms = sum(tot.values()) / 1e9 / 3
            print(f"batch {B}: device total {total_ms:.1f} ms/step", flush=True)
            for name, ps in tot.most_common(30):
                print(f"{ps/1e9/3:9.3f} ms x{n[name]:4d}  {name[:105]}", flush=True)

if __name__ == "__main__":
    main()
