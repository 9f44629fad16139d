"""Data pipeline tests: resize parity vs torch, affine-warp properties,
folder datasets, loader determinism/sharding, augmentation invariants."""

import os

import numpy as np
import pytest


# ---------------------------------------------------------------- resize

def test_resize_np_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from mirage_tpu.data.augment import resize_np

    img = rng.random((3, 37, 53)).astype(np.float32)
    for mode in ["bilinear", "nearest"]:
        want = torch.nn.functional.interpolate(
            torch.from_numpy(img)[None], size=(64, 48), mode=mode)[0].numpy()
        got = resize_np(img, (64, 48), mode=mode)
        np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------- affine

def test_affine_identity(rng):
    from mirage_tpu.data.augment import affine_warp

    img = rng.random((33, 33)).astype(np.float32)
    out = affine_warp(img, 0.0, (0, 0), 1.0, 0.0)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_affine_translation(rng):
    from mirage_tpu.data.augment import affine_warp

    img = rng.random((32, 32)).astype(np.float32)
    out = affine_warp(img, 0.0, (3, 0), 1.0, 0.0)  # content moves +x
    np.testing.assert_allclose(out[:, 3:], img[:, :-3], atol=1e-6)
    assert np.all(out[:, :3] == 0)  # fill
    out = affine_warp(img, 0.0, (0, -2), 1.0, 0.0)  # content moves -y
    np.testing.assert_allclose(out[:-2], img[2:], atol=1e-6)


def test_affine_rotation_90(rng):
    from mirage_tpu.data.augment import affine_warp

    img = rng.random((31, 31)).astype(np.float32)  # odd => exact center
    out = affine_warp(img, 90.0, (0, 0), 1.0, 0.0)
    # positive angle rotates image content clockwise in (row, col) display
    np.testing.assert_allclose(out, np.rot90(img, k=-1), atol=1e-4)


def test_affine_labels_preserved(rng):
    from mirage_tpu.data.augment import affine_warp

    labels = rng.integers(0, 5, (64, 64)).astype(np.int32)
    out = affine_warp(labels, 7.0, (3, -2), 1.05, 2.0, order=0)
    assert out.dtype == labels.dtype
    assert set(np.unique(out)) <= set(range(5)) | {0}


# ---------------------------------------------------------------- folders

@pytest.fixture()
def multitask_tree(tmp_path, rng):
    from PIL import Image

    n = 6
    for task in ["bscan", "semseg"]:
        d = tmp_path / task / "sub"
        d.mkdir(parents=True)
        for i in range(n):
            if task == "bscan":
                arr = (rng.random((32, 32)) * 255).astype(np.uint8)
            else:
                arr = rng.integers(0, 3, (32, 32)).astype(np.uint8) * 100
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return str(tmp_path), n


def test_multitask_folder(multitask_tree):
    from mirage_tpu.data.folder import MultiTaskImageFolder

    root, n = multitask_tree
    ds = MultiTaskImageFolder(root, ["bscan", "semseg"],
                              mapping={0: 0, 100: 1, 200: 2})
    assert len(ds) == n
    sample, _, sid = ds[0]
    assert sid == "img_000"
    assert sample["bscan"].dtype == np.float32
    assert 0.0 <= sample["bscan"].min() and sample["bscan"].max() <= 1.0
    assert set(np.unique(sample["semseg"])) <= {0, 1, 2}


def test_multitask_folder_max_images(multitask_tree):
    from mirage_tpu.data.folder import MultiTaskImageFolder

    root, _ = multitask_tree
    ds1 = MultiTaskImageFolder(root, ["bscan"], max_images=3)
    ds2 = MultiTaskImageFolder(root, ["bscan"], max_images=3)
    assert len(ds1) == 3
    assert ds1.samples["bscan"] == ds2.samples["bscan"]  # seeded subsample


def test_pretrain_folder_npy(tmp_path, rng):
    from mirage_tpu.data.folder import MultiTaskPretDatasetFolder

    for task in ["bscan", "bscanlayermap"]:
        d = tmp_path / task
        d.mkdir()
        for i in range(3):
            if task == "bscan":
                np.save(d / f"s{i}.npy", (rng.random((16, 16)) * 255).astype(np.uint8))
            else:
                np.save(d / f"s{i}.npy", rng.integers(0, 13, (16, 16)).astype(np.uint8))
    ds = MultiTaskPretDatasetFolder(str(tmp_path), ["bscan", "bscanlayermap"],
                                    use_cache=True)
    sample, _, sid = ds[1]
    assert sample["bscan"].dtype == np.float32 and sample["bscan"].max() <= 1.0
    assert sample["bscanlayermap"].dtype == np.int64
    sample2, _, _ = ds[1]  # cached path
    np.testing.assert_array_equal(sample["bscan"], sample2["bscan"])


def test_image_folder_cls(tmp_path, rng):
    from PIL import Image

    from mirage_tpu.data.folder import ImageFolder

    for cls in ["healthy", "sick"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            Image.fromarray((rng.random((16, 16)) * 255).astype(np.uint8)).save(
                d / f"{i}.png")
    ds = ImageFolder(str(tmp_path))
    assert ds.num_classes == 2 and len(ds) == 8
    img, target, sid = ds[0]
    assert target == 0  # 'healthy' sorts first


# ---------------------------------------------------------------- loader

class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __getitem__(self, item):
        i, rng = item
        return np.full((2, 2), i, np.float32), i, str(i)

    def __len__(self):
        return self.n


def test_loader_coverage_and_determinism():
    from mirage_tpu.data.loader import DataLoader

    ds = _ArrayDataset(23)
    dl = DataLoader(ds, batch_size=5, shuffle=True, num_workers=4, seed=1)
    dl.set_epoch(0)
    seen1 = [b[1] for b in dl]
    assert sum(len(b) for b in seen1) == 23
    assert sorted(np.concatenate(seen1).tolist()) == list(range(23))
    dl2 = DataLoader(ds, batch_size=5, shuffle=True, num_workers=2, seed=1)
    dl2.set_epoch(0)
    seen2 = [b[1] for b in dl2]
    for a, b in zip(seen1, seen2):
        np.testing.assert_array_equal(a, b)  # worker count must not matter
    dl2.set_epoch(1)
    seen3 = np.concatenate([b[1] for b in dl2])
    assert not np.array_equal(np.concatenate(seen1), seen3)  # reshuffled


def test_loader_drop_last_and_sharding():
    from mirage_tpu.data.loader import DataLoader

    ds = _ArrayDataset(23)
    dl = DataLoader(ds, batch_size=5, drop_last=True)
    assert len(dl) == 4
    shards = []
    for k in range(2):
        dlk = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                         shard_index=k, num_shards=2)
        shards.append(np.concatenate([b[1] for b in dlk]))
    assert len(shards[0]) == len(shards[1]) == 12  # padded to equal stripes
    union = set(shards[0].tolist()) | set(shards[1].tolist())
    assert union == set(range(23))


def test_loader_error_propagates():
    from mirage_tpu.data.loader import DataLoader

    class Bad:
        def __getitem__(self, item):
            raise ValueError("boom")

        def __len__(self):
            return 4

    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(Bad(), batch_size=2))


# ------------------------------------------------------------- augment

def test_pretrain_augment(rng):
    from mirage_tpu.data.augment import PretrainAugment

    aug = PretrainAugment({"bscan": (64, 64), "slo": (64, 64),
                           "bscanlayermap": (16, 16)}, hflip=1.0)
    sample = {
        "bscan": rng.random((96, 96)).astype(np.float32),
        "slo": rng.random((96, 96)).astype(np.float32),
        "bscanlayermap": rng.integers(0, 13, (96, 96)),
    }
    out = aug(sample, np.random.default_rng(0))
    assert out["bscan"].shape == (1, 64, 64) and out["bscan"].dtype == np.float32
    assert out["slo"].shape == (1, 64, 64)
    assert out["bscanlayermap"].shape == (16, 16)
    assert out["bscanlayermap"].dtype == np.int32
    assert set(np.unique(out["bscanlayermap"])) <= set(range(13))
    assert 0.0 <= out["bscan"].min() and out["bscan"].max() <= 1.0


def test_pretrain_augment_shared_flip(rng):
    """With affine/intensity off and hflip=1, every modality must flip
    identically (the correlated-augmentation contract)."""
    from mirage_tpu.data.augment import PretrainAugment

    aug = PretrainAugment({"bscan": (32, 32), "slo": (32, 32)},
                          hflip=1.0, intensity_shift=0.0, affine=False)
    x = rng.random((32, 32)).astype(np.float32)
    out = aug({"bscan": x, "slo": x.copy()}, np.random.default_rng(0))
    np.testing.assert_allclose(out["bscan"][0], x[:, ::-1], atol=1e-6)
    np.testing.assert_allclose(out["slo"][0], x[:, ::-1], atol=1e-6)


def test_semseg_transform_geometry_shared(rng):
    from mirage_tpu.data.augment import SemSegTransform

    img = np.zeros((80, 80), np.float32)
    img[10:40, 20:60] = 1.0
    mask = (img > 0.5).astype(np.int64)
    tr = SemSegTransform(train=True, input_size=64)
    out = tr({"bscan": img, "semseg": mask}, np.random.default_rng(4))
    assert out["bscan"].shape == (1, 64, 64)
    assert out["semseg"].shape == (64, 64) and out["semseg"].dtype == np.int32
    agree = np.mean((out["bscan"][0] > 0.5) == (out["semseg"] > 0))
    assert agree > 0.97, agree  # same flip/resize/crop applied to both


def test_semseg_transform_eval_norms(rng):
    from mirage_tpu.data.augment import SemSegTransform

    img = rng.random((50, 50)).astype(np.float32)
    mask = rng.integers(0, 4, (50, 50))
    for norm, channels in [("minmax", 1), ("imagenet", 3), ("sam", 3),
                           ("z-score", 3)]:
        tr = SemSegTransform(train=False, input_size=32, norm=norm)
        out = tr({"bscan": img, "semseg": mask}, np.random.default_rng(0))
        assert out["bscan"].shape == (channels, 32, 32), norm


def test_cls_transform(rng):
    from mirage_tpu.data.augment import ClsTransform

    raw = (rng.random((70, 90, 3)) * 255).astype(np.uint8)
    out = ClsTransform(input_size=64, train=True)(raw, np.random.default_rng(0))
    assert out.shape == (1, 64, 64) and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    out = ClsTransform(input_size=64, train=False, norm="imagenet")(
        raw, np.random.default_rng(0))
    assert out.shape == (3, 64, 64)


def test_loader_early_break_no_deadlock():
    """Abandoning iteration mid-epoch (max_steps_per_epoch pattern) must not
    leave producer threads blocked."""
    import threading

    from mirage_tpu.data.loader import DataLoader

    before = threading.active_count()
    ds = _ArrayDataset(64)
    for _ in range(5):
        dl = DataLoader(ds, batch_size=4, num_workers=2, prefetch=1)
        for i, _batch in enumerate(dl):
            if i == 1:
                break
    import time

    time.sleep(0.5)
    assert threading.active_count() <= before + 2


def test_random_affine_channel_reference_semantics(rng):
    """p default 1.0, per-channel 0.9 gate, and the fill==0.5 magic
    (random in-range fill) — mutils/transforms.py:107-148."""
    from mirage_tpu.data.augment import RandomAffineChannel

    img = np.full((2, 16, 16), 0.75, np.float32)
    img[:, :2] = 0.25  # min 0.25, max 0.75

    # fill=0.5 must draw fills from [img.min, img.max]
    t = RandomAffineChannel(degrees=0.0, translate=(0.5, 0.5), shear=0.0,
                            scale=(1.0, 1.0), fill=0.5, channel_p=1.0)
    seen = set()
    for i in range(10):
        out = t(img, np.random.default_rng(i))
        new_vals = np.setdiff1d(np.unique(out.round(4)),
                                np.unique(img.round(4)))
        seen.update(new_vals.tolist())
    assert seen, "translation should expose fill values"
    assert all(0.25 - 1e-3 <= v <= 0.75 + 1e-3 for v in seen), seen

    # None resolves to constant 0 fill (torchvision semantics), not random
    t0 = RandomAffineChannel(degrees=0.0, translate=(0.5, 0.5), shear=0.0,
                             scale=(1.0, 1.0), fill=None, channel_p=1.0)
    out = t0(img, np.random.default_rng(0))
    extra = np.setdiff1d(np.unique(out.round(4)), np.unique(img.round(4)))
    assert all(abs(v) < 1e-6 for v in extra), extra

    # channel gate: with channel_p=0 nothing changes even though p=1
    tg = RandomAffineChannel(fill=0.0, channel_p=0.0)
    np.testing.assert_array_equal(tg(img, np.random.default_rng(0)), img)
