"""End-to-end pipeline tests on synthetic micro-datasets (SURVEY.md §4.3)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cenet_tpu.evaluate.nifti import read_nifti, write_nifti
from cenet_tpu.evaluate.volume import VolumeInferencer, VolumeInferenceConfig, run_inference


def test_nifti_round_trip(rng, tmp_path):
    vol = rng.standard_normal((5, 32, 40)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    write_nifti(p, vol, spacing=(1.0, 1.0, 2.5))
    back = read_nifti(p)
    np.testing.assert_array_equal(back, vol)


def test_volume_inference_perfect_oracle(rng):
    """An oracle predictor that sees the labels must score dice 1.0 / hd95 0."""
    d, h, w, k = 6, 96, 96, 3
    label = np.zeros((d, h, w), np.int32)
    label[:, 20:50, 20:50] = 1
    label[:, 60:80, 60:80] = 2
    image = label.astype(np.float32) * 0.3 + rng.standard_normal((d, h, w)).astype(np.float32) * 0.01

    cfg = VolumeInferenceConfig(img_size=96, chunk=4, normalize=False, num_classes=k)

    def oracle_predict(x):
        # x: (chunk, 96, 96, 1) — reconstruct labels from the clean intensity levels
        lvl = jnp.round(x[..., 0] / 0.3).astype(jnp.int32).clip(0, k - 1)
        return jax.nn.one_hot(lvl, k)

    inf = VolumeInferencer(oracle_predict, cfg)
    pred, metrics = inf.evaluate_case(image, label)
    assert pred.shape == label.shape
    for dice, hd in metrics:
        assert dice > 0.99, metrics
        assert hd <= 1.5, metrics


def test_volume_inference_resizes_and_pads(rng):
    """Non-224 volumes go through zoom → chunked padded forward → back-zoom."""
    d, h, w, k = 5, 100, 120, 2
    label = np.zeros((d, h, w), np.int32)
    label[:, 30:70, 40:80] = 1
    image = rng.standard_normal((d, h, w)).astype(np.float32)
    cfg = VolumeInferenceConfig(img_size=64, chunk=4, normalize=True, num_classes=k)

    calls = []

    def fake_predict(x):
        calls.append(x.shape)
        return jnp.stack([jnp.ones(x.shape[:3]), jnp.zeros(x.shape[:3])], axis=-1)

    inf = VolumeInferencer(fake_predict, cfg)
    pred = inf.predict_volume(image)
    assert pred.shape == (d, h, w)
    assert all(s == (4, 64, 64, 1) for s in calls)  # padded fixed-shape chunks
    assert (pred == 0).all()


def test_run_inference_aggregation(rng, caplog):
    k = 2
    label = np.zeros((4, 64, 64), np.int32)
    label[:, 16:48, 16:48] = 1
    image = label.astype(np.float32)
    cfg = VolumeInferenceConfig(img_size=64, chunk=4, normalize=False, num_classes=k)

    def oracle(x):
        lvl = (x[..., 0] > 0.5).astype(jnp.int32)
        return jax.nn.one_hot(lvl, k)

    inf = VolumeInferencer(oracle, cfg)
    cases = [{"image": image, "label": label, "case_name": f"case{i}"} for i in range(3)]
    dice, hd = run_inference(inf, cases)
    assert dice > 0.99 and hd == 0.0


def test_volume_uint16_transfer_exact_for_integer_volumes(rng):
    """uint16 scale/offset upload (VERDICT r4 #3) is EXACT for integer-valued
    volumes (raw HU-style CT): scale snaps to 1 and codes are the intensities."""
    d, h, w, k = 6, 80, 80, 3
    image = rng.integers(-1024, 3072, (d, h, w)).astype(np.float32)  # HU-like ints

    def predict(x):
        lvl = jnp.clip(jnp.abs(jnp.round(x[..., 0])) % k, 0, k - 1).astype(jnp.int32)
        return jax.nn.one_hot(lvl, k)

    base = VolumeInferenceConfig(img_size=80, chunk=4, normalize=False, num_classes=k)
    inf16 = VolumeInferencer(predict, dataclasses_replace(base, transfer_dtype="uint16"))
    vol, scale, offset = inf16._encode(image)
    assert vol.dtype == np.uint16 and scale == 1.0 and offset == float(image.min())
    np.testing.assert_array_equal(
        vol.astype(np.float32) * scale + offset, image
    )
    a = VolumeInferencer(predict, base).predict_volume(image)
    b = inf16.predict_volume(image)
    np.testing.assert_array_equal(a, b)


def test_volume_quantized_transfer_close_for_float_volumes(rng):
    """uint16/uint8 on float volumes: affine quantization bounded by the code book
    (≤ range/65535 and ≤ range/255 respectively), decode on device."""
    image = rng.random((4, 64, 64)).astype(np.float32) * 3.0 - 1.0
    for dt, steps in (("uint16", 65535.0), ("uint8", 255.0)):
        cfg = VolumeInferenceConfig(img_size=64, chunk=4, normalize=False,
                                    num_classes=2, transfer_dtype=dt)
        inf = VolumeInferencer(lambda x: jnp.stack([x[..., 0], -x[..., 0]], -1), cfg)
        vol, scale, offset = inf._encode(image)
        rec = vol.astype(np.float32) * scale + offset
        span = float(image.max() - image.min())
        assert np.abs(rec - image).max() <= span / steps * 0.5 + 1e-6
        pred = inf.predict_volume(image)
        assert pred.shape == image.shape


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_volume_host_zoom_matches_device_zoom(rng):
    """host_zoom (round 5): the host-side numpy spline downscale is the same
    separable operator as the device path, so predictions must agree — both with
    a zoom-sensitive fake predictor and fp32 transfer (bit-level math differs
    only at fp32 rounding; a thresholded predictor makes it label-stable)."""
    d, h, w, k = 6, 96, 112, 3
    image = rng.standard_normal((d, h, w)).astype(np.float32) * 2.0

    def predict(x):  # threshold bands of the zoomed intensity
        lvl = jnp.clip((x[..., 0] > 0).astype(jnp.int32) + (x[..., 0] > 0.5), 0, k - 1)
        return jax.nn.one_hot(lvl, k)

    base = VolumeInferenceConfig(img_size=48, chunk=4, normalize=False, num_classes=k)
    dev = VolumeInferencer(predict, base).predict_volume(image)
    host = VolumeInferencer(predict, dataclasses_replace(base, host_zoom=True)).predict_volume(image)
    assert host.shape == dev.shape == (d, h, w)
    assert (host == dev).mean() > 0.999  # fp32-rounding flips only at band edges

    # upscaling inputs must NOT take the host path (more bytes on the wire)
    small = rng.standard_normal((d, 32, 32)).astype(np.float32)
    up = VolumeInferencer(predict, dataclasses_replace(base, host_zoom=True))
    assert not up._host_zoom_active(32, 32)
    assert up.predict_volume(small).shape == (d, 32, 32)


def test_volume_host_zoom_scan_path_and_quantized(rng):
    """host_zoom composes with the scan-dispatch path and with uint8/uint16
    post-zoom quantization (quantize-after-zoom, per-chunk affine)."""
    d, h, w, k = 8, 96, 96, 2
    image = rng.standard_normal((d, h, w)).astype(np.float32)

    def predict(x):
        return jnp.stack([x[..., 0], -x[..., 0]], -1)

    def predict_many(xs):
        return jax.vmap(lambda x: jnp.argmax(predict(x), -1).astype(jnp.uint8))(xs)

    base = VolumeInferenceConfig(img_size=48, chunk=4, normalize=False, num_classes=k,
                                 host_zoom=True)
    per_chunk = VolumeInferencer(predict, base).predict_volume(image)
    scan = VolumeInferencer(predict, base, predict_many_fn=predict_many).predict_volume(image)
    np.testing.assert_array_equal(per_chunk, scan)

    u16 = VolumeInferencer(
        predict, dataclasses_replace(base, transfer_dtype="uint16")
    ).predict_volume(image)
    assert u16.shape == per_chunk.shape
    assert (u16 == per_chunk).mean() > 0.99  # quantization flips only at the boundary


def test_volume_inference_predict_many_matches_per_chunk(rng):
    """The scan-dispatch path (predict_many_fn, groups of scan_chunks) must produce
    the same volume as per-chunk dispatch, including group padding."""
    d, h, w, k = 10, 64, 64, 3  # 3 chunks of 4 -> one group of 4 pads to 2 groups... (chunk=4, scan=2)
    label = np.zeros((d, h, w), np.int32)
    label[:, 16:40, 16:40] = 1
    image = label.astype(np.float32) * 0.4 + 0.1
    cfg1 = VolumeInferenceConfig(img_size=64, chunk=4, normalize=False, num_classes=k)
    cfg2 = VolumeInferenceConfig(img_size=64, chunk=4, normalize=False, num_classes=k, scan_chunks=2)

    def predict(x):
        lvl = jnp.round(x[..., 0] / 0.4).astype(jnp.int32).clip(0, k - 1)
        return jax.nn.one_hot(lvl, k)

    def predict_many(xs):
        def body(_, x):
            return None, jnp.argmax(predict(x), -1).astype(jnp.uint8)
        return jax.lax.scan(body, None, xs)[1]

    a = VolumeInferencer(predict, cfg1).predict_volume(image)
    b = VolumeInferencer(predict, cfg2, predict_many_fn=predict_many).predict_volume(image)
    np.testing.assert_array_equal(a, b)
