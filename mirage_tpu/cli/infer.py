"""Inference CLI on the bundled example triplet.

Parity: ``python mirage_wrapper.py`` (mirage_wrapper.py:247-313) — loads
``{image_path}/*/{bscan,slo,bscanlayermap}.npy``, resizes (512 bilinear /255,
layermap 128 nearest int), runs the explicit-mask forward with any subset of
modalities, saves ``__out_{task}.png`` reconstructions (layermap argmax/12)
or ``__out_features.npy`` token features.

Usage:
  python -m mirage_tpu.cli.infer --weights ./MIRAGE-Base.pth \
      [--features] [--modalities bscan,slo] [--image_path ./_example_images]
"""

import argparse
from pathlib import Path

import numpy as np

from mirage_tpu.cli.config import apply_platform_env

apply_platform_env()


def to_array(fn):
    """Reference to_tensor (mirage_wrapper.py:247-265): npy/png -> resized
    float [0,1] (1,1,512,512) or int layermap (1,128,128). Uses the exact
    skimage.transform.resize semantics of the reference CLI (anti-aliased
    order-1 for images, order-0 for layermaps) — NOT the torch-semantics
    resizes used elsewhere."""
    from mirage_tpu.data.augment import skimage_resize
    from mirage_tpu.data.folder import read_image

    fn = str(fn)
    img = read_image(fn)
    if img.ndim == 3:
        img = img[..., 0]
    if "layermap" in fn:
        img = skimage_resize(img, (128, 128), order=0, anti_aliasing=False)
        return img[None].astype(np.int32)
    img = skimage_resize(img, (512, 512), order=1, anti_aliasing=True) / 255.0
    return img[None, None].astype(np.float32)


def save_image01(arr, path):
    """(C, H, W) or (H, W) float in [0,1] -> PNG with torchvision
    save_image's exact quantization (mul 255, add 0.5, clamp, floor —
    round-half-up, not truncation)."""
    from PIL import Image

    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3:
        arr = arr[0]
    u8 = np.clip(arr * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    Image.fromarray(u8).save(path)


def main(argv=None):
    parser = argparse.ArgumentParser("MIRAGE inference (TPU)")
    parser.add_argument("--features", action="store_true")
    parser.add_argument("--model_size", default="base", choices=["base", "large"])
    parser.add_argument("--weights", default=None, type=str,
                        help="defaults to ./__weights/MIRAGE-{Base,Large}.pth")
    parser.add_argument("--image_path", default="./_example_images", type=str)
    parser.add_argument("--modalities", default="bscan", type=str,
                        help="comma-separated subset present at inference")
    args = parser.parse_args(argv)

    from mirage_tpu.api.wrapper import MIRAGEWrapper

    weights = args.weights or f"./__weights/MIRAGE-{args.model_size.capitalize()}.pth"
    model = MIRAGEWrapper(weights=weights, output_adapters=not args.features)
    present = args.modalities.split(",")

    for fsid in sorted(Path(args.image_path).iterdir()):
        if not fsid.is_dir():
            continue
        data = {}
        for mod in present:
            data[mod] = to_array(fsid / f"{mod}.npy")
            print("Input:", mod, data[mod].shape, data[mod].min(), data[mod].max())
        if args.features:
            out = np.asarray(model.features(data))
            print("Features:", out.shape)
            np.save(fsid / "__out_features.npy", out)
        else:
            out = model(data)
            print("Outputs:")
            for k, v in out.items():
                v = np.asarray(v, np.float32)
                print("\t", k, v.shape, v.min(), v.max())
                if "layermap" in k:
                    v = v.argmax(1) / 12.0
                save_image01(v[0], fsid / f"__out_{k}.png")


if __name__ == "__main__":
    main()
