"""Metric tests: brute-force verification of medpy-style surface distances."""

import numpy as np
import pytest
from scipy import ndimage

from cenet_tpu.evaluate.metrics import (
    assd,
    calculate_metric_percase,
    dice_coefficient,
    hd95,
    iou_binary,
    jaccard,
    pixel_accuracy,
)


def brute_surface_distances(a, b):
    """O(n²) reference: distances from border(a) voxels to nearest border(b) voxel."""
    conn = ndimage.generate_binary_structure(a.ndim, 1)

    def border(m):
        return m ^ ndimage.binary_erosion(m, conn, border_value=1)

    pa = np.argwhere(border(a))
    pb = np.argwhere(border(b))
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def random_blob(rng, shape, seed_frac=0.002, iters=6):
    m = rng.random(shape) < seed_frac
    m = ndimage.binary_dilation(m, iterations=iters)
    return m


@pytest.mark.parametrize("ndim", [2, 3])
def test_hd95_assd_match_bruteforce(rng, ndim):
    shape = (48, 48) if ndim == 2 else (16, 24, 24)
    a = random_blob(rng, shape)
    b = random_blob(rng, shape)
    if not a.any() or not b.any():
        pytest.skip("degenerate blob")
    d1 = brute_surface_distances(a, b)
    d2 = brute_surface_distances(b, a)
    ref_hd95 = max(np.percentile(d1, 95), np.percentile(d2, 95))
    ref_assd = np.mean(np.hstack([d1, d2]))
    assert abs(hd95(a, b) - ref_hd95) < 1e-9
    assert abs(assd(a, b) - ref_assd) < 1e-9


def test_dice_jaccard_known_values():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True  # 16 px
    b[4:8, 4:8] = True  # 16 px, overlap 4
    assert abs(dice_coefficient(a, b) - 2 * 4 / 32) < 1e-12
    assert abs(jaccard(a, b) - 4 / 28) < 1e-12


def test_identical_masks_zero_distance():
    a = np.zeros((20, 20), bool)
    a[5:15, 5:15] = True
    assert hd95(a, a) == 0.0
    assert assd(a, a) == 0.0
    assert dice_coefficient(a, a) == 1.0


def test_percase_empty_conventions():
    empty = np.zeros((8, 8))
    full = np.ones((8, 8))
    assert calculate_metric_percase(full.copy(), empty.copy()) == (1.0, 0.0)
    assert calculate_metric_percase(empty.copy(), full.copy()) == (0.0, 0.0)
    assert calculate_metric_percase(empty.copy(), empty.copy()) == (0.0, 0.0)


def test_percase_binarizes_labels():
    """pred==i comparisons arrive as bool, but raw multi-label arrays must binarize."""
    pred = np.zeros((10, 10))
    gt = np.zeros((10, 10))
    pred[2:6, 2:6] = 3.0
    gt[2:6, 2:6] = 7.0
    d, h = calculate_metric_percase(pred, gt)
    assert d == 1.0 and h == 0.0


def test_skin_metrics():
    a = np.zeros((10, 10)); a[:5] = 1
    b = np.zeros((10, 10)); b[:5] = 1
    assert pixel_accuracy(a, b) == 1.0
    assert abs(iou_binary(a, b) - 1.0) < 1e-6


def test_voxelspacing():
    a = np.zeros((10, 10), bool); a[2, 2] = True
    b = np.zeros((10, 10), bool); b[2, 6] = True
    # spacing (1, 0.5): 4 columns apart → distance 2.0
    assert abs(assd(a, b, voxelspacing=(1.0, 0.5)) - 2.0) < 1e-9


def test_native_edt_matches_scipy(rng):
    """C++ Felzenszwalb EDT vs scipy.distance_transform_edt (2D + 3D + sampling)."""
    pytest.importorskip("cenet_tpu.native")
    from cenet_tpu.native import edt as native_edt

    for shape, sampling in [((64, 80), None), ((64, 80), (1.0, 0.7)),
                            ((12, 32, 40), None), ((12, 32, 40), (2.5, 1.0, 1.0))]:
        m = rng.random(shape) < 0.9  # mostly foreground
        ref = ndimage.distance_transform_edt(m, sampling=sampling)
        got = native_edt(m, sampling=sampling)
        np.testing.assert_allclose(got, ref, atol=1e-9)
