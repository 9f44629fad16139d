"""Interleaved A/B of MIRAGE_BLOCK_FUSE=decoder on the flagship inference step.

The r5 inference trace pins the decoder tail at ~33 ms/step of latency-bound
sub-2 ms kernel calls (3 xattn + 6 self-attn + 9 MLP halves); per-task
vmap-batching measured -1.92% (stacked param relayouts). The one untried
lever is CALL FUSION: route each dim-256 decoder self-attn block through the
whole-block kernel (ops/fused_block.py), halving its call count (2 -> 1 per
block, 12 -> 6 calls) with zero relayout. The same fusion measured NEGATIVE
on the bandwidth-bound encoder (866->821, fused_block.py header) — the
decoder's regime is different, hence this A/B.

Build both jitted forwards in one process (nn.block._BLOCK_FUSE toggled at
trace time), time in alternating ABBA rounds so host noise hits both arms.

Usage: python scripts/bench_blockfuse_ab.py [rounds] [iters] [batch]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def main(rounds=8, iters=12, B=512):
    from __graft_entry__ import _build_mirage
    import mirage_tpu.nn.block as nb

    model = _build_mirage("large", img=512, layermap=128,
                          compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    rng = np.random.default_rng(0)
    x = {"bscan": jnp.asarray(rng.random((B, 1, 512, 512)), jnp.float32),
         "slo": jnp.zeros((B, 1, 512, 512), jnp.float32),
         "bscanlayermap": jnp.zeros((B, 128, 128), jnp.int32)}
    masks = {"bscan": jnp.zeros((B, 256), jnp.int32),
             "slo": jnp.ones((B, 256), jnp.int32),
             "bscanlayermap": jnp.ones((B, 256), jnp.int32)}

    def make_fwd():
        @jax.jit
        def fwd(params, x, masks, acc):
            preds, _ = model(params, x, mask_inputs=False, task_masks=masks,
                             num_visible=256, deterministic=True,
                             absent_tasks=("slo", "bscanlayermap"))
            return acc + sum(jnp.sum(p.astype(jnp.float32))
                             for p in preds.values())
        return fwd

    fns, outs = {}, {}
    for arm in ("fused", "halves"):
        nb._BLOCK_FUSE = "decoder" if arm == "fused" else "off"
        fns[arm] = make_fwd()
        t0 = time.perf_counter()
        outs[arm] = float(fns[arm](params, x, masks, jnp.zeros(())))
        print(f"[{arm}] compile+first {time.perf_counter()-t0:.1f}s "
              f"checksum {outs[arm]:.4f}", flush=True)
    # same math either way (bf16 reassociation aside)
    assert np.isfinite(outs["fused"]) and np.isfinite(outs["halves"])
    rel = abs(outs["fused"] - outs["halves"]) / (abs(outs["halves"]) + 1e-9)
    print(f"checksum rel diff {rel:.2e}", flush=True)

    results = {"fused": [], "halves": []}
    order = ["fused", "halves", "halves", "fused"]
    for r in range(rounds):
        arm = order[r % len(order)]
        fwd = fns[arm]
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(iters):
            acc = fwd(params, x, masks, acc)
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        results[arm].append(dt)
        print(f"round {r} [{arm}]: {dt*1e3:.2f} ms/step  {B/dt:.1f} img/s",
              flush=True)

    for arm in results:
        med = sorted(results[arm])[len(results[arm]) // 2]
        best = min(results[arm])
        print(f"{arm}: median {med*1e3:.2f} ms ({B/med:.1f} img/s), "
              f"best {best*1e3:.2f} ms ({B/best:.1f} img/s)", flush=True)
    mf, mh = min(results["fused"]), min(results["halves"])
    print(f"decoder block-fusion delta: {(mh-mf)*1e3:+.2f} ms/step "
          f"({100*(mh/mf-1):+.2f}% halves->fused)", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if len(a) > 0 else 8, int(a[1]) if len(a) > 1 else 12,
         int(a[2]) if len(a) > 2 else 512)
