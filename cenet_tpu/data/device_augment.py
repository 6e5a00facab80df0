"""On-device (jittable, batched) augmentation — the TPU-native data path.

The reference augments per-sample in DataLoader workers; here the ACDC/Synapse
``RandomGenerator`` (50% rot90×k+flip, else 50% rotate(−20,20) order-0, then zoom
to img_size — ``dataset_acdc.py:32-48``) runs as one jitted batched transform on
raw device batches, keyed by ``jax.random`` PRNG keys. The host pipeline
(`data/augment.py`) is the scipy-exact production default; this module is an
opt-in library API for throughput runs where the 1-core host would otherwise
bottleneck (call ``random_generator_batch`` on raw batches before the train
step). It is intentionally not wired into the CLI.

All ops are batch-uniform-shape: per-sample variants are computed and selected,
rotation is a gather from a per-sample rotated coordinate grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F


def _rot90_stack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (4, B, H, W, C): all four rot90 variants (square inputs)."""
    r1 = jnp.rot90(x, 1, axes=(1, 2))
    r2 = jnp.rot90(x, 2, axes=(1, 2))
    r3 = jnp.rot90(x, 3, axes=(1, 2))
    return jnp.stack([x, r1, r2, r3])


def _select_per_sample(stack: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """stack (K, B, ...), idx (B,) → (B, ...) picking stack[idx[b], b]."""
    return jnp.take_along_axis(
        stack, idx[None, :].reshape((1, -1) + (1,) * (stack.ndim - 2)), axis=0
    )[0]


def _rotate_nearest(x: jnp.ndarray, angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rotation (order 0, constant-0 outside), matching
    scipy.ndimage.rotate(..., order=0, reshape=False) conventions. x: (B, H, W, C)."""
    b, h, w, c = x.shape
    theta = -jnp.deg2rad(angles_deg.astype(jnp.float32))  # scipy's positive-angle direction
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # inverse mapping: output (y,x) samples input rotated by -θ about the center
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    ys = cos * (yy - cy)[None] - sin * (xx - cx)[None] + cy
    xs = sin * (yy - cy)[None] + cos * (xx - cx)[None] + cx
    # spline order-0 rounds half-up (floor(x+0.5)), not banker's rounding
    yi = jnp.floor(ys + 0.5).astype(jnp.int32)
    xi = jnp.floor(xs + 0.5).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    flat = x.reshape(b, h * w, c)
    gathered = jnp.take_along_axis(flat, (yi * w + xi).reshape(b, h * w, 1), axis=1)
    gathered = gathered.reshape(b, h, w, c)
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


@partial(jax.jit, static_argnames=("out_size",))
def random_generator_batch(
    key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray, out_size: int = 224
):
    """Batched RandomGenerator: images (B, H, W, 1) float, labels (B, H, W) int.

    Per sample: u1 > 0.5 → rot90×k + flip; elif u2 > 0.5 → rotate(−20, 20) order-0;
    then zoom to out_size (cubic image / nearest label — device-side exact scipy
    operators).
    """
    b = images.shape[0]
    k_u1, k_u2, k_rot, k_axis, k_ang = jax.random.split(key, 5)
    u1 = jax.random.uniform(k_u1, (b,))
    u2 = jax.random.uniform(k_u2, (b,))
    kidx = jax.random.randint(k_rot, (b,), 0, 4)
    axis = jax.random.randint(k_axis, (b,), 0, 2)
    ang = jax.random.randint(k_ang, (b,), -20, 20).astype(jnp.float32)

    lab4 = labels[..., None].astype(images.dtype)

    def branch_rotflip(img, lab):
        img_r = _select_per_sample(_rot90_stack(img), kidx)
        lab_r = _select_per_sample(_rot90_stack(lab), kidx)
        img_f = jnp.where((axis == 0)[:, None, None, None], img_r[:, ::-1], img_r[:, :, ::-1])
        lab_f = jnp.where((axis == 0)[:, None, None, None], lab_r[:, ::-1], lab_r[:, :, ::-1])
        return img_f, lab_f

    def branch_rotate(img, lab):
        return _rotate_nearest(img, ang), _rotate_nearest(lab, ang)

    img_a, lab_a = branch_rotflip(images, lab4)
    img_b, lab_b = branch_rotate(images, lab4)

    take_a = (u1 > 0.5)[:, None, None, None]
    take_b = (~(u1 > 0.5) & (u2 > 0.5))[:, None, None, None]
    img = jnp.where(take_a, img_a, jnp.where(take_b, img_b, images))
    lab = jnp.where(take_a, lab_a, jnp.where(take_b, lab_b, lab4))

    if images.shape[1] != out_size or images.shape[2] != out_size:
        img = F.zoom_resize(img, (out_size, out_size), order=3)
        lab = F.zoom_nearest(lab, (out_size, out_size))
    return img, lab[..., 0].astype(labels.dtype)
