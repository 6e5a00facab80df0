"""Cross-check functional resampling ops against torch/scipy ground truth.

The reference framework's numerics hinge on exact interpolation semantics
(F.interpolate both align_corners modes, scipy spline zoom, nearest upsample,
adaptive pooling); these tests pin our matrix-based TPU implementations to the
originals on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF
from scipy.ndimage import zoom as scipy_zoom

from cenet_tpu.nn import functional as F


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((14, 14), (28, 28)), ((56, 56), (44, 44)), ((7, 7), (49, 49)), ((28, 28), (11, 11))])
def test_resize_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 5)).astype(np.float32)
    ours = np.asarray(F.resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    ref = tF.interpolate(torch.from_numpy(to_nchw(x)), size=out_hw, mode="bilinear", align_corners=align_corners)
    np.testing.assert_allclose(ours, to_nhwc(ref.numpy()), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("scale", [0.8, 0.4, 0.75, 0.5, 1.0])
def test_resize_bilinear_by_scale_matches_torch(rng, scale):
    x = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    ours = np.asarray(F.resize_bilinear_by_scale(jnp.asarray(x), scale, align_corners=False))
    ref = tF.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=scale, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, to_nhwc(ref.numpy()), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("in_hw,out_hw", [((512, 512), (224, 224)), ((100, 120), (224, 224))])
def test_zoom_resize_matches_scipy(rng, order, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 1)).astype(np.float32)
    if order == 0:
        ours = np.asarray(F.zoom_nearest(jnp.asarray(x), out_hw))
        atol = 0.0
    else:
        ours = np.asarray(F.zoom_resize(jnp.asarray(x), out_hw, order=order))
        atol = 1e-3  # fp32 matmul vs float64 scipy path
    ref = scipy_zoom(x[0, :, :, 0].astype(np.float64), (out_hw[0] / in_hw[0], out_hw[1] / in_hw[1]), order=order)
    assert ref.shape == out_hw
    np.testing.assert_allclose(ours[0, :, :, 0], ref.astype(np.float32), atol=atol, rtol=1e-3)


def test_zoom_nearest_int_labels(rng):
    lab = rng.integers(0, 9, size=(1, 224, 224, 1)).astype(np.int32)
    ours = np.asarray(F.zoom_nearest(jnp.asarray(lab), (512, 512)))
    ref = scipy_zoom(lab[0, :, :, 0], (512 / 224, 512 / 224), order=0)
    np.testing.assert_array_equal(ours[0, :, :, 0], ref)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 7, 7, 4)).astype(np.float32)
    ours = np.asarray(F.upsample_nearest(jnp.asarray(x), 2))
    ref = tF.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2, mode="nearest")
    np.testing.assert_array_equal(ours, to_nhwc(ref.numpy()))


@pytest.mark.parametrize("in_hw", [(56, 56), (14, 14), (13, 9)])
def test_adaptive_avg_pool_matches_torch(rng, in_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(F.adaptive_avg_pool2d(jnp.asarray(x), (7, 7)))
    ref = tF.adaptive_avg_pool2d(torch.from_numpy(to_nchw(x)), (7, 7))
    np.testing.assert_allclose(ours, to_nhwc(ref.numpy()), atol=1e-5, rtol=1e-5)


def test_max_pool2d_matches_torch(rng):
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(F.max_pool2d(jnp.asarray(x), 2, 2))
    ref = tF.max_pool2d(torch.from_numpy(to_nchw(x)), 2, 2)
    np.testing.assert_array_equal(ours, to_nhwc(ref.numpy()))


def test_channel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 12)).astype(np.float32)
    ours = np.asarray(F.channel_shuffle(jnp.asarray(x), 3))
    xt = torch.from_numpy(to_nchw(x))
    b, c, h, w = xt.shape
    ref = xt.view(b, 3, c // 3, h, w).transpose(1, 2).contiguous().view(b, c, h, w)
    np.testing.assert_array_equal(ours, to_nhwc(ref.numpy()))


def test_channel_shuffle_identity_when_groups_eq_channels(rng):
    # EUCB calls channel_shuffle(x, in_channels) — a no-op; pin that down.
    x = rng.standard_normal((1, 3, 3, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(F.channel_shuffle(jnp.asarray(x), 8)), x)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal((128,)).astype(np.float32)
    ours = np.asarray(F.gelu(jnp.asarray(x)))
    ref = tF.gelu(torch.from_numpy(x), approximate="none")
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_softmax_fp32(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32) * 10
    ours = np.asarray(F.softmax_fp32(jnp.asarray(x)))
    ref = tF.softmax(torch.from_numpy(x), dim=-1)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_conv5x5_packed_matches_direct(rng):
    import jax.numpy as jnp
    import jax

    from cenet_tpu.nn import functional as F

    for (shape, cout) in [((2, 16, 16, 8), 16), ((1, 12, 20, 1), 32), ((2, 14, 14, 32), 32)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((5, 5, shape[-1], cout)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = F.conv5x5_packed(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)
        # gradients flow through the kernel restructuring (pure jnp ops)
        g1 = jax.grad(lambda w: jnp.sum(F.conv5x5_packed(x, w) ** 2))(w)
        g2 = jax.grad(lambda w: jnp.sum(jax.lax.conv_general_dilated(
            x, w, (1, 1), ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3, rtol=2e-3)
