"""MIRAGE model server: dynamic-batched reconstruction + feature serving.

Beyond the reference (whose only inference surface is the one-shot
``python mirage_wrapper.py`` CLI): coalesces concurrent requests into
TPU-sized batches (mirage_tpu/serve.py) in front of MIRAGEWrapper —
optionally sharded over a device mesh for multi-chip serving.

Usage:
  python -m mirage_tpu.cli.serve --weights ./MIRAGE-Base.pth \
      [--port 8473] [--max_batch 16] [--max_wait_ms 5] [--bf16] \
      [--mesh data=4,fsdp=1,tensor=2]

Client (stdlib):
  import io, urllib.request, numpy as np
  buf = io.BytesIO(); np.savez(buf, bscan=img)              # (H, W) in [0,1]
  r = urllib.request.urlopen("http://localhost:8473/v1/reconstruct",
                             buf.getvalue())
  out = dict(np.load(io.BytesIO(r.read())))                  # task -> array
"""

import argparse

import numpy as np

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()


def make_model_fns(wrapper, in_domains):
    """Adapt MIRAGEWrapper to the batched numpy interface of serve.py."""
    import jax.numpy as jnp

    def prep(batch):
        x = {}
        for k, arr in batch.items():
            if k not in in_domains:
                raise ValueError(f"unknown modality {k!r} (have {in_domains})")
            arr = np.asarray(arr)
            if k == "bscanlayermap":
                x[k] = jnp.asarray(arr.astype(np.int32))
            else:
                if arr.ndim == 3:  # (B, H, W) -> (B, 1, H, W)
                    arr = arr[:, None]
                x[k] = jnp.asarray(arr.astype(np.float32))
        return x

    def reconstruct(batch):
        preds = wrapper(prep(batch))
        return {k: np.asarray(v.astype(jnp.float32)) for k, v in preds.items()}

    def features(batch):
        feats = wrapper.features(prep(batch))
        return {"features": np.asarray(feats.astype(jnp.float32))}

    return reconstruct, features


def warmup(wrapper, model_fns, max_batch: int, *, pow2: bool = True):
    """Pre-compile every batch shape the dispatcher can emit, before traffic.

    Runs the all-modalities zero request at each ladder size, largest first
    (the big compile seeds XLA's subexpression caches for the smaller rungs).
    With the power-of-two padding that is log2(max_batch)+1 shapes; without,
    all of 1..max_batch. Restarts replay these from the persistent
    compilation cache (cli/config.apply_compile_cache) in seconds.
    """
    if pow2:
        sizes = [1]
        while sizes[-1] < max_batch:
            sizes.append(sizes[-1] * 2)
    else:
        sizes = list(range(1, max_batch + 1))
    for b in reversed(sizes):
        zeros = {}
        for d in wrapper.in_domains:
            h, w = wrapper.input_size[d]
            zeros[d] = (np.zeros((b, h, w), np.int32) if d == "bscanlayermap"
                        else np.zeros((b, 1, h, w), np.float32))
        print(f"warmup: compiling batch={b} ...", flush=True)
        for fn in model_fns:
            fn(zeros)
    print("warmup: done", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", required=True)
    ap.add_argument("--modalities", default="bscan-slo-bscanlayermap")
    ap.add_argument("--input_size", type=int, default=512)
    ap.add_argument("--patch_size", type=int, default=32)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8473)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--request_timeout_s", type=float, default=600.0,
                    help="per-request wait bound; must cover a cold XLA "
                         "compile (minutes) when starting without --warmup")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute + bf16-resident weights (the measured "
                         "fast inference configuration, BASELINE.md)")
    ap.add_argument("--no_pad_pow2", action="store_true",
                    help="disable padding batches to the power-of-two ladder "
                         "(every distinct batch size then compiles separately)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the full batch-size ladder for the "
                         "all-modalities request before accepting traffic "
                         "(near-free on restart via the persistent "
                         "compilation cache)")
    ap.add_argument("--mesh", default=None,
                    help="multi-chip serving, e.g. data=4,fsdp=1,tensor=2")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mirage_tpu.api.wrapper import MIRAGEWrapper

    mesh = None
    if args.mesh:
        from mirage_tpu.parallel.mesh import make_mesh

        axes = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh({k: int(v) for k, v in axes.items()})

    wrapper = MIRAGEWrapper(
        input_size=args.input_size, patch_size=args.patch_size,
        modalities=args.modalities, weights=args.weights,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32, mesh=mesh)
    if args.bf16:
        wrapper.params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            wrapper.params)

    from mirage_tpu.serve import MIRAGEServer, pow2_padded

    reconstruct, features = make_model_fns(wrapper, wrapper.in_domains)
    if not args.no_pad_pow2:
        reconstruct, features = pow2_padded(reconstruct), pow2_padded(features)

    if args.warmup:
        warmup(wrapper, [reconstruct, features], args.max_batch,
               pow2=not args.no_pad_pow2)

    server = MIRAGEServer(
        reconstruct_fn=reconstruct, features_fn=features,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        request_timeout_s=args.request_timeout_s,
        device=str(jax.devices()[0]), n_params=wrapper._n_params)
    print(f"serving {args.modalities} on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms, "
          f"mesh={args.mesh})", flush=True)
    try:
        server.serve(host=args.host, port=args.port)
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
