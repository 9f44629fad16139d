"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload: MIRAGE-Large inference on the mirage_wrapper.py path
(bscan present at 512²/p32; slo + 13-class layermap reconstructed by the
three SpatialOutputAdapter decoders), bf16 compute and bf16-resident params,
batch 512 (round-3 sweeps: pre-exp2 kernels 64->857, 96->868, 128->876,
192->881, 256->884.5, 320->884.6 — the round-2b absent-modality skip +
half-block fusion moved the optimum up from batch 64; with the
exp2-softmax/one-pass-LN kernels 64->871, 256->894.1, 320->894.1,
384->896.1, 512->898.7, 768->900.6, 1024->900.1 — the curve is flat past
512 (+0.2% at 768 is within the ±1% drift band) and 512 keeps step
latency under 600 ms; round-1 XLA-path optimum was batch 48 at 485).

Timing: dispatches are chained through a scalar accumulator and synced once
at the end — block_until_ready is a no-op on the tunneled axon platform and
per-step host reads would add tunnel round-trips to every step.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
comparison constant below is a first-principles estimate of the PyTorch
reference on A100 fp16 for the same workload:
  ViT-L encoder on 257 tokens + 3 cross-attn decoders ≈ 175 GFLOPs/img;
  A100 fp16 peak 312 TFLOP/s at a generous 50% MFU → ~890 img/s.
vs_baseline = measured / 890 (so the >2x A100 north star reads as >2.0).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


A100_EST_IMG_PER_SEC = 890.0
BATCH = 512
ITERS = 12

# The axon tunnel occasionally drops; a hung backend init inside this
# process cannot be cancelled, so probe device availability in a SUBPROCESS
# and wait (bounded) for recovery before committing to the in-process jax
# import. The default deadline must sit WELL inside the driver's own
# timeout (round 3's BENCH_r03.json was an uninformative rc=124 because a
# 2700 s wait outlived it) — fail fast with a parseable JSON error line
# instead. Overridable for longer local waits.
CHIP_WAIT_S = int(os.environ.get("MIRAGE_BENCH_CHIP_WAIT_S", "900"))
_PROBE = "import jax; jax.devices()"


def wait_for_chip(deadline_s: float = CHIP_WAIT_S) -> None:
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run([sys.executable, "-c", _PROBE], timeout=180,
                           check=True, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            waited = time.monotonic() - t0
            if waited >= deadline_s:
                print(f"bench.py: device backend unavailable after "
                      f"{waited:.0f}s ({attempt} probes) — giving up",
                      file=sys.stderr, flush=True)
                # One parseable JSON line so the driver artifact records an
                # informative failure rather than a bare timeout.
                print(json.dumps({
                    "metric": "mirage_large_infer_images_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "images/sec",
                    "vs_baseline": 0.0,
                    "error": f"chip unavailable ({attempt} probes over "
                             f"{waited:.0f}s)",
                }), flush=True)
                sys.exit(0)
            print(f"bench.py: device probe failed (attempt {attempt}, "
                  f"{waited:.0f}s elapsed); retrying", file=sys.stderr,
                  flush=True)
            time.sleep(60)


def main_all():
    """--all: headline + the four training workloads (one JSON line each)
    and a BENCH_TRAIN.json artifact for round-over-round regression
    visibility (VERDICT r2 weak #3)."""
    import os

    main()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_train import run

    rows = run("all")
    for r in rows:
        print(json.dumps(r))
    with open("BENCH_TRAIN.json", "w") as f:
        json.dump(rows, f, indent=1)


def main():
    wait_for_chip()

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the headline HLO recompiles through the
    # tunnel (minutes) every driver run otherwise. Steady-state step timing
    # is unaffected (the timed loop runs after the warmup sync).
    from mirage_tpu.cli.config import apply_compile_cache

    apply_compile_cache()

    from __graft_entry__ import _build_mirage

    model = _build_mirage("large", img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    # bf16-resident weights: halves HBM weight traffic (inference needs no
    # f32 master copy)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    rng = np.random.default_rng(0)
    x = {
        "bscan": jnp.asarray(rng.random((BATCH, 1, 512, 512)), jnp.float32),
        "slo": jnp.zeros((BATCH, 1, 512, 512), jnp.float32),
        "bscanlayermap": jnp.zeros((BATCH, 128, 128), jnp.int32),
    }
    masks = {
        "bscan": jnp.zeros((BATCH, 256), jnp.int32),
        "slo": jnp.ones((BATCH, 256), jnp.int32),
        "bscanlayermap": jnp.ones((BATCH, 256), jnp.int32),
    }

    @jax.jit
    def fwd(params, x, masks, acc):
        preds, _ = model(params, x, mask_inputs=False, task_masks=masks,
                         num_visible=256, deterministic=True,
                         absent_tasks=("slo", "bscanlayermap"))
        # scalar checksum chains the dispatches and forces full execution
        return acc + sum(jnp.sum(p.astype(jnp.float32)) for p in preds.values())

    # Warmup/compile (host read = the only real sync on this platform)
    float(fwd(params, x, masks, jnp.zeros(())))

    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(ITERS):
        acc = fwd(params, x, masks, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    img_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "mirage_large_infer_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / A100_EST_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main_all() if "--all" in sys.argv[1:] else main()
