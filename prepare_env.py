#!/usr/bin/env python3
"""Environment bootstrap: download MIRAGE weights + benchmark datasets.

Capability parity: reference prepare_env.py — pulls the official weights and
the 8 classification / 5 segmentation datasets from the j-morano/MIRAGE
GitHub releases, reassembling multi-part zip archives
(reference prepare_env.py:81-91, :194-231). The venv/pip section of the
reference is dropped: this package targets a JAX/TPU environment that is
provisioned separately (see README).

The fetch step is separated from the reassemble/extract logic so the latter
is unit-testable offline (tests/test_prepare_env.py) and so already-
downloaded archives can be installed without network via --from-dir.

Usage:
  python prepare_env.py [-w all|base|large|none]
                        [-d all|classification|segmentation|none|
                           classification-non-cross|segmentation-non-cross]
                        [--from-dir DIR]   # offline: archives already on disk
"""

import argparse
import glob
import os
import shutil
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


def fetch(url: str, directory: str, from_dir=None):
    """Materialize the release file named by `url` into `directory`:
    download, or copy from a local archive directory (--from-dir)."""
    os.makedirs(directory, exist_ok=True)
    name = url.rsplit("/", 1)[-1]
    fname = os.path.join(directory, name)
    stem = name.split("_part_")[0].split(".")[0]
    if any(Path(directory, c).exists() for c in (name, stem)):
        print(f"  already present: {name}")
        return fname
    # crash-safe: materialize to a temp name and rename, so an interrupted
    # transfer never leaves a partial file the presence check would skip
    tmp = fname + ".tmp"
    if from_dir is not None:
        src = os.path.join(from_dir, name)
        if not os.path.isfile(src):
            raise FileNotFoundError(f"--from-dir has no {name} (expected {src})")
        print(f"  copying {src}")
        shutil.copyfile(src, tmp)
    else:
        print(f"  downloading {url}")
        urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, fname)
    return fname


def join_parts(directory: str, dataset: str):
    """Concatenate {dataset}_part_?? files into {dataset}.zip (the release
    splits large archives with the Linux `split` command; reassembly is plain
    byte concatenation in part order). Crash-safe: writes to a temp file and
    renames, so an interrupted join never leaves a corrupt {dataset}.zip that
    a rerun would skip over."""
    target = os.path.join(directory, f"{dataset}.zip")
    if os.path.exists(target) or os.path.isdir(os.path.join(directory, dataset)):
        return target
    parts = sorted(glob.glob(os.path.join(directory, f"{dataset}_part_*")))
    if not parts:
        raise FileNotFoundError(f"no parts found for {dataset} in {directory}")
    print(f"  combining {len(parts)} parts -> {dataset}.zip")
    tmp = target + ".tmp"
    with open(tmp, "wb") as out:
        for part in parts:
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out)
    os.replace(tmp, target)
    for part in parts:
        os.remove(part)
    return target


def extract_all(directory: str, keep_zips: bool = False):
    extracted = []
    for zf in sorted(glob.glob(os.path.join(directory, "*.zip"))):
        print(f"  extracting {os.path.basename(zf)}")
        with zipfile.ZipFile(zf) as z:
            z.extractall(directory)
        extracted.append(zf)
        if not keep_zips:
            os.remove(zf)
    return extracted


def prepare(weights="all", datasets="all", nodelete=False, from_dir=None,
            root="."):
    """The full bootstrap, parameterized for tests (root=tmpdir,
    from_dir=local archives)."""
    print("Model weights")
    wdir = os.path.join(root, "__weights")
    if weights in ("base", "all"):
        fetch(f"{BASE_URL}/weights/MIRAGE-Base.pth", wdir, from_dir)
    if weights in ("large", "all"):
        fetch(f"{BASE_URL}/weights/MIRAGE-Large.pth", wdir, from_dir)

    if datasets in ("classification", "all", "classification-non-cross"):
        print("Classification datasets")
        d = os.path.join(root, "__datasets", "Classification")
        names = CLS_DATASETS + (
            CLS_CROSS if datasets != "classification-non-cross" else [])
        for name in names:
            fetch(f"{BASE_URL}/cls-data/{name}.zip", d, from_dir)
        extract_all(d, keep_zips=nodelete)

    if datasets in ("segmentation", "all", "segmentation-non-cross"):
        print("Segmentation datasets")
        d = os.path.join(root, "__datasets", "Segmentation")
        for name in SEG_DATASETS:
            fetch(f"{BASE_URL}/seg-data/{name}.zip", d, from_dir)
        multipart = SEG_MULTIPART if datasets != "segmentation-non-cross" \
            else SEG_MULTIPART_NON_CROSS
        for dataset, parts in multipart.items():
            for part in parts:
                fetch(f"{BASE_URL}/seg-data/{dataset}_part_{part}", d, from_dir)
            join_parts(d, dataset)
        extract_all(d, keep_zips=nodelete)

    print("Environment ready.")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-w", "--weights", default="all",
                   choices=["all", "base", "large", "none"])
    p.add_argument("-d", "--datasets", default="all",
                   choices=["all", "classification", "segmentation", "none",
                            "classification-non-cross", "segmentation-non-cross"])
    p.add_argument("--nodelete", action="store_true",
                   help="keep the downloaded zip archives")
    p.add_argument("--from-dir", default=None, type=str,
                   help="offline mode: take release files from this directory "
                        "instead of downloading")
    args = p.parse_args(argv)
    prepare(weights=args.weights, datasets=args.datasets,
            nodelete=args.nodelete, from_dir=args.from_dir)


if __name__ == "__main__":
    main()
