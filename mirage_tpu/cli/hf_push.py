"""HF Hub distribution helper.

Parity: hf/helper_hf.py — 'push' converts a reference-format checkpoint
(.pth or orbax dir) into the HF layout (model.safetensors + config.json,
inner-model key namespace) locally and optionally pushes to the Hub;
'load' round-trips it through the one-file public API as a check.

Usage:
  python -m mirage_tpu.cli.hf_push -t push -s base \
      --weights ./__weights/MIRAGE-Base.pth [--repo j-morano/MIRAGE-Base --hub]
  python -m mirage_tpu.cli.hf_push -t load -s base --path ./MIRAGE-Base
"""

import argparse
import json
import os

import numpy as np

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()


def export_orbax(ckpt_dir: str, out_path: str):
    """Export a training checkpoint (orbax dir written by run_pretraining)
    to a reference-namespace safetensors file. The model is rebuilt from the
    args recorded in meta.json."""
    import json as _json

    from argparse import Namespace

    from mirage_tpu.cli.run_pretraining import build_model
    from mirage_tpu.train import checkpoint as ckpt
    from mirage_tpu.train.checkpoint import save_safetensors

    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = _json.load(f)
    args = Namespace(**meta["args"])
    args.patch_size = {k: tuple(v) for k, v in args.patch_size.items()}
    args.input_size = {k: tuple(v) for k, v in args.input_size.items()}
    model = build_model(args)

    import jax

    params = model.init_params(jax.random.PRNGKey(0))
    state, _ = ckpt.load_checkpoint(ckpt_dir, {"params": params}, partial=True)
    save_safetensors(state["params"], model, out_path)
    print(f"Exported {ckpt_dir} -> {out_path}")
    return out_path


def model_card(size: str) -> str:
    """Model-card README for a pushed repo (the reference uploads
    hf/README.md alongside config+weights, hf/helper_hf.py:56-62; without it
    a pushed repo is undocumented)."""
    name = f"MIRAGE-{size.capitalize()}"
    vit = "ViT-Base" if size == "base" else "ViT-Large"
    return f"""---
license: cc-by-nc-nd-4.0
library_name: jax
pipeline_tag: image-feature-extraction
tags:
- OCT
- SLO
- retinal-imaging
- classification
- segmentation
- jax
---

# {name} (TPU / JAX)

Weights of the {name} multimodal retinal-imaging foundation model
(based on {vit}), from "MIRAGE: Multimodal foundation model and benchmark
for comprehensive retinal OCT image analysis" (arXiv:2506.08900), in the
TPU-native JAX distribution (`mirage_tpu`). The tensor layout matches the
PyTorch reference key namespace, so these weights also load in the original
repo (https://github.com/j-morano/MIRAGE).

## Models

Model | Resolution | Repo
--- | --- | ---
MIRAGE-Base  | 512x512 | j-morano/MIRAGE-Base
MIRAGE-Large | 512x512 | j-morano/MIRAGE-Large

## Usage

Only the self-contained `hf.py` (jax + numpy) is needed:

```python
import numpy as np
from mirage_tpu.hf import MIRAGEWrapper  # or: from hf import MIRAGEWrapper

model = MIRAGEWrapper.from_pretrained("j-morano/{name}", size="{size}")
bscan = np.zeros((1, 1, 512, 512), np.float32)  # [0, 1] grayscale
slo = np.zeros((1, 1, 512, 512), np.float32)
features = model({{"bscan": bscan, "slo": slo}})  # (B, 513, D) tokens
```

For reconstruction decoders, fine-tuning, and the full benchmark pipeline
see the `mirage_tpu` package (`api/wrapper.py`, `cli/`).

## Citation

Morano et al., "MIRAGE: Multimodal foundation model and benchmark for
comprehensive retinal OCT image analysis", arXiv:2506.08900, 2025.
"""


def main(argv=None):
    p = argparse.ArgumentParser("MIRAGE HF push/load")
    p.add_argument("-t", "--task", choices=["push", "load", "export"], required=True)
    p.add_argument("-s", "--size", choices=["base", "large"], default="base")
    p.add_argument("--weights", default=None, type=str)
    p.add_argument("--path", default=None, type=str,
                   help="local output dir (push) / source (load)")
    p.add_argument("--repo", default=None, type=str)
    p.add_argument("--hub", action="store_true",
                   help="also push to the HF hub (requires network + token)")
    args = p.parse_args(argv)

    name = f"MIRAGE-{args.size.capitalize()}"
    config = {"input_size": 512, "patch_size": 32, "modalities": "bscan-slo",
              "size": args.size}

    if args.task == "export":
        assert args.weights, "--weights: orbax checkpoint dir (checkpoint-N)"
        out = args.path or os.path.join(os.path.dirname(args.weights.rstrip("/")),
                                        "model.safetensors")
        return export_orbax(args.weights, out)

    if args.task == "push":
        from safetensors.numpy import save_file

        from mirage_tpu.api import convert

        weights = args.weights or f"./__weights/{name}.pth"
        if weights.endswith(".pth"):
            sd = convert.load_torch_checkpoint(weights)["model"]
        else:
            sd = convert.load_safetensors(weights)
        # encoder-only HF flavor: drop the reconstruction decoders
        sd = {k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()
              if "output_adapters" not in k}
        out_dir = args.path or name
        os.makedirs(out_dir, exist_ok=True)
        save_file(sd, os.path.join(out_dir, "model.safetensors"))
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(out_dir, "README.md"), "w") as f:
            f.write(model_card(args.size))
        print(f"Wrote {out_dir}/model.safetensors ({len(sd)} tensors) "
              "+ config.json + README.md")
        if args.hub:
            from huggingface_hub import HfApi

            api = HfApi()
            repo = args.repo or f"j-morano/{name}"
            api.create_repo(repo, repo_type="model", exist_ok=True)
            api.upload_folder(folder_path=out_dir, repo_id=repo,
                              repo_type="model")
            print(f"Pushed to {repo}")
    else:
        from mirage_tpu.hf import MIRAGEWrapper

        src = args.path or (args.repo or f"j-morano/{name}")
        model = MIRAGEWrapper.from_pretrained(src, size=args.size)
        x = np.zeros((1, 1, 512, 512), np.float32)
        out = model({"bscan": x, "slo": x})
        print(f"Loaded {src}: features {tuple(out.shape)}")


if __name__ == "__main__":
    main()
