"""Hermetic prepare_env tests (VERDICT r2: the multipart reassembly and
extraction logic shipped untested): synthetic local part-files and archives,
no network — the --from-dir offline mode exercises the full flow."""

import os
import sys
import zipfile
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import prepare_env  # noqa: E402


def _make_zip(path: Path, members):
    with zipfile.ZipFile(path, "w") as z:
        for name, data in members.items():
            z.writestr(name, data)
    return path.read_bytes()


def test_join_parts_reassembles_split_zip(tmp_path):
    blob = _make_zip(tmp_path / "src.zip",
                     {"D/INFO.json": "{}", "D/train/bscan/a.png": "x" * 5000})
    (tmp_path / "src.zip").unlink()
    # split into 3 uneven parts like the release's `split -b`
    d = tmp_path / "seg"
    d.mkdir()
    cuts = [0, 1700, 3400, len(blob)]
    for i, suffix in enumerate(["aa", "ab", "ac"]):
        (d / f"DS_part_{suffix}").write_bytes(blob[cuts[i]:cuts[i + 1]])

    target = prepare_env.join_parts(str(d), "DS")
    assert Path(target).read_bytes() == blob
    assert not list(d.glob("DS_part_*")), "parts should be removed after join"
    # idempotent: a rerun with the target present is a no-op
    assert prepare_env.join_parts(str(d), "DS") == target
    with zipfile.ZipFile(target) as z:
        assert "D/INFO.json" in z.namelist()


def test_join_parts_missing_parts_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        prepare_env.join_parts(str(tmp_path), "Nope")


def test_join_parts_interrupted_run_recovers(tmp_path):
    """A stale .tmp from a crashed join must not shadow the real target."""
    blob = b"A" * 100 + b"B" * 100
    (tmp_path / "DS_part_aa").write_bytes(blob[:100])
    (tmp_path / "DS_part_ab").write_bytes(blob[100:])
    (tmp_path / "DS.zip.tmp").write_bytes(b"garbage")  # crashed previous run
    target = prepare_env.join_parts(str(tmp_path), "DS")
    assert Path(target).read_bytes() == blob


def test_extract_all(tmp_path):
    _make_zip(tmp_path / "A.zip", {"A/x.txt": "1"})
    _make_zip(tmp_path / "B.zip", {"B/y.txt": "2"})
    done = prepare_env.extract_all(str(tmp_path))
    assert len(done) == 2
    assert (tmp_path / "A" / "x.txt").read_text() == "1"
    assert (tmp_path / "B" / "y.txt").read_text() == "2"
    assert not list(tmp_path.glob("*.zip")), "zips removed by default"


def test_fetch_from_dir_and_presence_skip(tmp_path, capsys):
    src = tmp_path / "archives"
    src.mkdir()
    (src / "X.zip").write_bytes(b"zzz")
    dest = tmp_path / "out"
    f = prepare_env.fetch("https://host/rel/X.zip", str(dest), from_dir=str(src))
    assert Path(f).read_bytes() == b"zzz"
    # second call: presence check short-circuits (no copy, no download)
    prepare_env.fetch("https://host/rel/X.zip", str(dest), from_dir=str(src))
    assert "already present" in capsys.readouterr().out
    with pytest.raises(FileNotFoundError):
        prepare_env.fetch("https://host/rel/Missing.zip", str(dest),
                          from_dir=str(src))


def test_prepare_offline_end_to_end(tmp_path):
    """Full seg flow from a local archive dir: plain zips + a multipart
    archive, reassembled and extracted into the __datasets layout."""
    arch = tmp_path / "archives"
    arch.mkdir()
    (arch / "MIRAGE-Base.pth").write_bytes(b"weights")
    for name in prepare_env.SEG_DATASETS:
        _make_zip(arch / f"{name}.zip", {f"{name}/INFO.json": "{}"})
    blob = _make_zip(arch / "RETOUCH_src.zip", {"RETOUCH/INFO.json": "{}"})
    (arch / "RETOUCH_src.zip").unlink()
    half = len(blob) // 2
    (arch / "RETOUCH_part_aa").write_bytes(blob[:half])
    (arch / "RETOUCH_part_ab").write_bytes(blob[half:])

    root = tmp_path / "env"
    prepare_env.prepare(weights="base", datasets="segmentation-non-cross",
                        from_dir=str(arch), root=str(root))
    seg = root / "__datasets" / "Segmentation"
    assert (root / "__weights" / "MIRAGE-Base.pth").read_bytes() == b"weights"
    for name in prepare_env.SEG_DATASETS + ["RETOUCH"]:
        assert (seg / name / "INFO.json").is_file(), name
    # rerun is a no-op (presence checks)
    prepare_env.prepare(weights="base", datasets="segmentation-non-cross",
                        from_dir=str(arch), root=str(root))
