"""Trace the flagship inference step and print the top device ops by time."""
import sys, os, time, glob, gzip, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def build(impl="auto", decoders=True):
    from __graft_entry__ import _build_mirage
    model = _build_mirage("large", img=512, layermap=128, compute_dtype=jnp.bfloat16)
    object.__setattr__(model, "attn_impl", impl)
    if not decoders:
        object.__setattr__(model, "output_adapters", None)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    B = 48
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.zeros((B, 1, 512, 512), jnp.float32),
         "bscanlayermap": jnp.zeros((B, 128, 128), jnp.int32)}
    masks = {"bscan": jnp.zeros((B, 256), jnp.int32),
             "slo": jnp.ones((B, 256), jnp.int32),
             "bscanlayermap": jnp.ones((B, 256), jnp.int32)}

    @jax.jit
    def fwd(params, x, masks, acc):
        out = model(params, x, mask_inputs=False, task_masks=masks,
                    num_visible=256, deterministic=True)
        preds = out[0] if model.output_adapters is not None else out[0]
        if isinstance(preds, dict):
            return acc + sum(jnp.sum(p.astype(jnp.float32)) for p in preds.values())
        return acc + jnp.sum(preds.astype(jnp.float32))
    return fwd, (params, x, masks)


def timestep(fwd, args, iters=20):
    float(fwd(*args, jnp.zeros(())))
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = fwd(*args, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    fwd, args = build("auto", decoders=False)
    t_enc = timestep(fwd, args)
    print(f"encoder-only: {t_enc*1e3:.2f} ms", flush=True)
    fwd, args = build("auto", decoders=True)
    t_full = timestep(fwd, args)
    print(f"full: {t_full*1e3:.2f} ms -> decoders+unpatchify ~= {(t_full-t_enc)*1e3:.2f} ms", flush=True)

    # xplane trace of the full step
    tracedir = "/tmp/mirage_prof"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        acc = jnp.zeros(())
        for _ in range(3):
            acc = fwd(*args, acc)
        float(acc)
    # parse: top ops on the device plane
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
