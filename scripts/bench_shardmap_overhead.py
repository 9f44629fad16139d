"""Diagnose the mesh-sanity shard_map 'overhead' (r4): plain jit vs the
1-device-mesh dp shard_map serving forward, timed BOTH ways:

  - unchained: N same-arg dispatches, one final host sync (what
    mesh_sanity_tpu.py's timeit did — measures dispatch pipelining, which
    the tunnel may limit differently per program kind)
  - chained: each call consumes the previous call's output (preds['bscan']
    fed back as x['bscan']) — the CLAUDE.md-correct methodology; measures
    true on-device step time

If chained times match while unchained diverge, the mesh-sanity 5x gap is a
host/tunnel dispatch artifact, not an on-device cost — serving at real
batch sizes amortizes it. Shapes via env: SMO_PRESET (large), SMO_B (8,256).

Usage (chip): python scripts/bench_shardmap_overhead.py
CPU smoke:    JAX_PLATFORMS=cpu MIRAGE_PALLAS=interpret SMO_PRESET=tiny \
              SMO_B=2,4 SMO_ITERS=2 python scripts/bench_shardmap_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from __graft_entry__ import _build_mirage
from mirage_tpu.parallel.mesh import dp_shard_map, make_mesh, replicate

PRESET = os.environ.get("SMO_PRESET", "large")
IMG = int(os.environ.get("SMO_IMG", 512))
BATCHES = tuple(int(b) for b in os.environ.get("SMO_B", "8,256").split(","))
ITERS = int(os.environ.get("SMO_ITERS", 8))


def main():
    model = _build_mirage(PRESET, img=IMG, layermap=IMG // 4,
                          compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        params)
    npt = (IMG // 32) ** 2
    mesh = make_mesh({"data": len(jax.devices())})
    rparams = replicate(params, mesh)

    def fwd(p, x, masks):
        preds, _ = model(p, x, mask_inputs=False, task_masks=masks,
                         num_visible=npt, deterministic=True,
                         absent_tasks=("slo", "bscanlayermap"))
        return preds

    f_plain = jax.jit(fwd)
    f_sm = jax.jit(dp_shard_map(fwd, mesh, n_batch_args=2, axes=("data",)))

    for b in BATCHES:
        rng = np.random.default_rng(0)
        x = {"bscan": jnp.asarray(rng.random((b, 1, IMG, IMG)), jnp.float32),
             "slo": jnp.zeros((b, 1, IMG, IMG), jnp.float32),
             "bscanlayermap": jnp.zeros((b, IMG // 4, IMG // 4), jnp.int32)}
        masks = {"bscan": jnp.zeros((b, npt), jnp.int32),
                 "slo": jnp.ones((b, npt), jnp.int32),
                 "bscanlayermap": jnp.ones((b, npt), jnp.int32)}
        place = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P("data", *([None] * (a.ndim - 1))))), t)
        cases = [("plain", f_plain, params, x, masks),
                 ("shard_map", f_sm, rparams, place(x), place(masks))]
        for name, fn, p, xx, mm in cases:
            out = fn(p, xx, mm)  # compile + warm
            float(jnp.sum(out["bscan"].astype(jnp.float32)))

            # unchained: same-arg dispatches, one sync
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(p, xx, mm)
            float(jnp.sum(out["bscan"].astype(jnp.float32)))
            t_un = (time.perf_counter() - t0) / ITERS

            # chained: output feeds the next input
            xc = dict(xx)
            out = fn(p, xc, mm)
            float(jnp.sum(out["bscan"].astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                xc = dict(xc)
                xc["bscan"] = out["bscan"].astype(jnp.float32)
                out = fn(p, xc, mm)
            float(jnp.sum(out["bscan"].astype(jnp.float32)))
            t_ch = (time.perf_counter() - t0) / ITERS
            print(f"B={b:4d} {name:9s} unchained {t_un*1e3:8.1f} ms "
                  f"({b/t_un:7.1f} img/s)  chained {t_ch*1e3:8.1f} ms "
                  f"({b/t_ch:7.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
