"""Record the reference wrapper's example-triplet outputs as a golden npz
(VERDICT r3 missing #1 / task #6).

The repo's parity tests otherwise need the reference mounted at test time;
this artifact makes the BASELINE.json north-star claim (example-triplet
inference, <1e-5) a RECORDED fact, and defines the procedure for pinning it
against the real released weights the moment they are available.

Modes:
- default (no args): random-init TINY reference model (torch.manual_seed(0),
  the parity-test dims) -> tests/golden/example_triplet_tiny.npz containing
  the f16-stored weights (loaded back exactly, so both sides compute from
  identical values), the preprocessed triplet inputs, and the reference
  torch forward outputs under the wrapper convention (bscan present,
  slo/layermap reconstructed; mirage_wrapper.py:269-313).
- --weights /path/MIRAGE-Base.pth (the released checkpoint, fetched via
  prepare_env.py): same recording with the real Base/Large model ->
  tests/golden/example_triplet_real_<stem>.npz. Run this ONCE anywhere the
  weights exist and commit the file; tests/test_real_weights.py's gated
  test then asserts our wrapper reproduces it to <1e-5 whenever
  MIRAGE_WEIGHTS_DIR points at the weights.

Requires /root/reference mounted + torch (the repo's test environment).
"""

import argparse
import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

EXAMPLES = "/root/reference/_example_images"


def _triplet_inputs():
    """Preprocess the bundled triplet with the reference's to_tensor
    semantics (cli/infer.to_array replicates mirage_wrapper.py:247-265,
    exactness covered by tests/test_infer_cli.py)."""
    from mirage_tpu.cli.infer import to_array

    fsid = sorted(p for p in os.listdir(EXAMPLES)
                  if os.path.isdir(os.path.join(EXAMPLES, p)))[0]
    base = os.path.join(EXAMPLES, fsid)
    return fsid, {m: to_array(os.path.join(base, f"{m}.npy"))
                  for m in ("bscan", "slo", "bscanlayermap")}


def _wrapper_forward(model, inputs):
    import torch

    masks = {"bscan": torch.zeros(1, 256, dtype=torch.long),
             "slo": torch.ones(1, 256, dtype=torch.long),
             "bscanlayermap": torch.ones(1, 256, dtype=torch.long)}
    xt = {"bscan": torch.from_numpy(np.asarray(inputs["bscan"])).float(),
          "slo": torch.zeros(1, 1, 512, 512),
          "bscanlayermap": torch.zeros(1, 128, 128, dtype=torch.long)}
    with torch.no_grad():
        preds, _ = model(xt, mask_inputs=False, task_masks=masks)
    return {k: v.numpy().astype(np.float32) for k, v in preds.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="released .pth; default: random-init tiny")
    ap.add_argument("--size", default="tiny", choices=("tiny", "base", "large"),
                    help="random-init model size (ignored with --weights). "
                         "base/large store NO weights — preds + the key/shape "
                         "table of a numpy-seeded state dict "
                         "(tests/test_fullsize_parity.seeded_state_dict), so "
                         "the ~110/330 M-param artifacts stay a few MB")
    args = ap.parse_args(argv)

    from conftest import REFERENCE_PATH, stub_reference_deps

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    stub_reference_deps()

    import torch

    fsid, inputs = _triplet_inputs()
    out = {"fsid": np.array(fsid),
           "in_bscan": inputs["bscan"].astype(np.float32),
           "in_slo": inputs["slo"].astype(np.float32),
           "in_bscanlayermap": inputs["bscanlayermap"].astype(np.int32)}

    if args.weights is None and args.size in ("base", "large"):
        import hashlib as _hl

        from test_fullsize_parity import (BASE, GOLD_SEED, LARGE,
                                          seeded_state_dict)
        from test_model_parity import build_reference_model

        dims = BASE if args.size == "base" else LARGE
        model = build_reference_model(REFERENCE_PATH, **dims)
        ref_sd = model.state_dict()
        keys_shapes = [(k, tuple(v.shape)) for k, v in ref_sd.items()]
        sd_np = seeded_state_dict(keys_shapes)
        model.load_state_dict({k: torch.from_numpy(v)
                               for k, v in sd_np.items()})
        h = _hl.sha256()
        for k in sorted(sd_np):
            h.update(sd_np[k].tobytes())
        maxrank = max(len(s) for _, s in keys_shapes)
        out["sd_keys"] = np.array([k for k, _ in keys_shapes])
        out["sd_shapes"] = np.array(
            [list(s) + [-1] * (maxrank - len(s)) for _, s in keys_shapes],
            np.int64)
        out["seed"] = np.int64(GOLD_SEED)
        out["sd_sha256"] = np.array(h.hexdigest())
        out["model_args"] = np.array(args.size)
        name = f"example_triplet_{args.size}.npz"
    elif args.weights is None:
        from test_model_parity import build_reference_model

        model = build_reference_model(REFERENCE_PATH)
        # store weights as f16 and LOAD THEM BACK so the recorded preds are
        # computed from exactly the values the test will reconstruct
        # (f16 -> f32 is exact; halves the artifact size)
        sd16 = {k: v.detach().cpu().numpy().astype(np.float16)
                for k, v in model.state_dict().items()}
        model.load_state_dict({k: torch.from_numpy(v.astype(np.float32))
                               for k, v in sd16.items()})
        for k, v in sd16.items():
            out[f"w_{k}"] = v
        out["model_args"] = np.array("tiny")
        name = "example_triplet_tiny.npz"
    else:
        import mirage_wrapper as mw

        wrapper = mw.MIRAGEWrapper(weights=args.weights)
        model = wrapper.model.eval()
        out["weights_sha256"] = np.array(
            hashlib.sha256(open(args.weights, "rb").read()).hexdigest())
        out["weights_name"] = np.array(os.path.basename(args.weights))
        name = ("example_triplet_real_"
                + os.path.splitext(os.path.basename(args.weights))[0]
                + ".npz")

    preds = _wrapper_forward(model, inputs)
    for k, v in preds.items():
        out[f"pred_{k}"] = v

    path = os.path.join(REPO, "tests", "golden", name)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
