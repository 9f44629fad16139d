"""Single-stream serving LATENCY for the flagship wrapper path.

Every BASELINE number so far is throughput-form (big batches, chained
dispatches). Production serving also cares about small-batch step latency,
so this records ms/request at B=1..64 for exactly bench.py's configuration
(MIRAGE-Large, bscan present, slo+layermap reconstructed, bf16 weights,
absent-tasks static fast path; reference path: mirage_wrapper.py:150-179).

Two timing forms per batch:
  - chained: N dispatches chained through a scalar accumulator, ONE host
    sync at the end — the device-side step time with the host out of the
    way (the same protocol as bench.py; a saturated single-stream server).
  - synced: one host read per step — an upper bound on request latency
    that INCLUDES the axon tunnel round-trip (block_until_ready is a no-op
    on this platform, so a host read is the only real sync; on a directly
    attached chip the true request latency sits between the two numbers).
"""
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

ITERS = 20

for B in [int(b) for b in (sys.argv[1:] or [1, 2, 4, 8, 16, 32, 64])]:
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

    float(fwd(params, x, masks, jnp.zeros(())))  # compile + warm

    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(ITERS):
        acc = fwd(params, x, masks, acc)
    float(acc)
    chained = (time.perf_counter() - t0) / ITERS

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fwd(params, x, masks, jnp.zeros(())))
    synced = (time.perf_counter() - t0) / ITERS

    print(f"B={B:3d}: chained {chained*1e3:8.2f} ms/step ({B/chained:7.1f} img/s)"
          f"  synced {synced*1e3:8.2f} ms/req", flush=True)
