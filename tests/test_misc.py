"""Tests for misc utilities, TTA transforms, and component-parity modules."""

import numpy as np

from cenet_tpu.core.misc import AvgMeter, histogram_equalization_rgb, one_hot_encoder, powerset
from cenet_tpu.data.tta import AddNoise


def test_avg_meter():
    m = AvgMeter(num=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        m.update(v)
    assert abs(m.avg - 2.5) < 1e-9
    assert abs(m.show() - 3.0) < 1e-9  # mean of last 3


def test_powerset():
    assert len(powerset([1, 2, 3])) == 7


def test_one_hot_encoder():
    v = np.array([[0, 1], [2, 1]])
    oh = one_hot_encoder(v, [0, 1, 2])
    assert oh.shape == (3, 2, 2)
    np.testing.assert_array_equal(oh.sum(0), np.ones((2, 2)))


def test_histogram_equalization(rng):
    img = (rng.random((32, 32, 3)) * 120).astype(np.uint8)  # low-contrast
    out = histogram_equalization_rgb(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.max() > img.max()  # contrast stretched


def test_add_noise_modes(rng):
    x = rng.random((16, 16)).astype(np.float32)
    for mode in ["none", "salt_pepper", "gaussian", "poisson", "speckle"]:
        y = AddNoise(mode, rng=np.random.default_rng(0))(x)
        assert y.shape == x.shape
        assert np.isfinite(y).all(), mode
    assert np.array_equal(AddNoise("none")(x), x)
