#!/usr/bin/env python3
"""Environment bootstrap: download MIRAGE weights + benchmark datasets.

Capability parity: reference prepare_env.py — pulls the official weights and
the 8 classification / 5 segmentation datasets from the j-morano/MIRAGE
GitHub releases, reassembling multi-part zip archives. The venv/pip section
of the reference is dropped: this package targets a JAX/TPU environment that
is provisioned separately (see README).

Usage:
  python prepare_env.py [-w all|base|large|none]
                        [-d all|classification|segmentation|none|
                           classification-non-cross|segmentation-non-cross]
"""

import argparse
import glob
import os
import urllib.request
import zipfile
from pathlib import Path

BASE_URL = "https://github.com/j-morano/MIRAGE/releases/download"

CLS_DATASETS = ["Duke_iAMD", "GAMMA", "Harvard_Glaucoma", "Noor_Eye_Hospital",
                "OCTDL", "OCTID", "OLIVES"]
CLS_CROSS = ["Noor_Eye_Hospital_cross_train", "Noor_Eye_Hospital_cross_test",
             "UMN_Duke_Srinivasan_cross_test"]
SEG_DATASETS = ["AROI", "Duke_DME", "GOALS"]
SEG_MULTIPART = {
    "Duke_iAMD_labeled": ["aa", "ab", "ac", "ad", "ae", "af", "ag", "ah"],
    "RETOUCH": ["aa", "ab"],
}
# Duke_iAMD_labeled is cross-eval only
SEG_MULTIPART_NON_CROSS = {"RETOUCH": ["aa", "ab"]}


def download_to(url: str, directory: str):
    os.makedirs(directory, exist_ok=True)
    fname = os.path.join(directory, url.rsplit("/", 1)[-1])
    stem = Path(fname).name.split("_part_")[0].split(".")[0]
    if any(Path(directory, c).exists() for c in (Path(fname).name, stem)):
        print(f"  already present: {Path(fname).name}")
        return fname
    print(f"  downloading {url}")
    urllib.request.urlretrieve(url, fname)
    return fname


def join_parts(directory: str, dataset: str):
    """Concatenate {dataset}_part_?? files into {dataset}.zip."""
    target = os.path.join(directory, f"{dataset}.zip")
    if os.path.exists(target) or os.path.isdir(os.path.join(directory, dataset)):
        return
    parts = sorted(glob.glob(os.path.join(directory, f"{dataset}_part_*")))
    print(f"  combining {len(parts)} parts -> {dataset}.zip")
    with open(target, "wb") as out:
        for part in parts:
            with open(part, "rb") as f:
                out.write(f.read())
            os.remove(part)


def extract_all(directory: str, keep_zips: bool = False):
    for zf in glob.glob(os.path.join(directory, "*.zip")):
        print(f"  extracting {os.path.basename(zf)}")
        with zipfile.ZipFile(zf) as z:
            z.extractall(directory)
        if not keep_zips:
            os.remove(zf)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-w", "--weights", default="all",
                   choices=["all", "base", "large", "none"])
    p.add_argument("-d", "--datasets", default="all",
                   choices=["all", "classification", "segmentation", "none",
                            "classification-non-cross", "segmentation-non-cross"])
    p.add_argument("--nodelete", action="store_true",
                   help="keep the downloaded zip archives")
    args = p.parse_args()

    print("Downloading model weights")
    if args.weights in ("base", "all"):
        download_to(f"{BASE_URL}/weights/MIRAGE-Base.pth", "__weights")
    if args.weights in ("large", "all"):
        download_to(f"{BASE_URL}/weights/MIRAGE-Large.pth", "__weights")

    if args.datasets in ("classification", "all", "classification-non-cross"):
        print("Classification datasets")
        d = "__datasets/Classification"
        names = CLS_DATASETS + (CLS_CROSS if args.datasets != "classification-non-cross" else [])
        for name in names:
            download_to(f"{BASE_URL}/cls-data/{name}.zip", d)
        extract_all(d, keep_zips=args.nodelete)

    if args.datasets in ("segmentation", "all", "segmentation-non-cross"):
        print("Segmentation datasets")
        d = "__datasets/Segmentation"
        for name in SEG_DATASETS:
            download_to(f"{BASE_URL}/seg-data/{name}.zip", d)
        multipart = SEG_MULTIPART if args.datasets != "segmentation-non-cross" \
            else SEG_MULTIPART_NON_CROSS
        for dataset, parts in multipart.items():
            for part in parts:
                download_to(f"{BASE_URL}/seg-data/{dataset}_part_{part}", d)
            join_parts(d, dataset)
        extract_all(d, keep_zips=args.nodelete)

    print("Environment ready.")


if __name__ == "__main__":
    main()
