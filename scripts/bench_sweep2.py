"""Batch sweep of the flagship step WITH the absent-tasks static fast path
(exactly bench.py's configuration)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from __graft_entry__ import _build_mirage

model = _build_mirage("large", img=512, layermap=128, compute_dtype=jnp.bfloat16)
params0 = model.init_params(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params0)

for B in [int(b) for b in (sys.argv[1:] or [64, 80, 96, 128, 192])]:
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
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(15):
        acc = fwd(params, x, masks, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / 15
    print(f"B={B}: {dt*1e3:.2f} ms/step  {B/dt:.1f} img/s", flush=True)
