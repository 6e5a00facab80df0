"""Host-side augmentation pipelines replicating the reference's semantics.

Three pipelines exist in the reference:

* ACDC/Synapse ``RandomGenerator`` (``dataset_acdc.py:32-48``): 50% rot90×k+flip,
  else 50% rotate(−20,20) order-0; zoom to img_size (cubic image / nearest label).
* Synapse train ``imgaug SomeOf(0-4)`` (``dataset_synapse.py:86-97``): flips,
  additive Gaussian noise, Gaussian blur, linear contrast, affine
  scale/rotate/shear/translate, piecewise affine — reimplemented with
  numpy/scipy/cv2 (imgaug is not a dependency); parity is distributional
  (SURVEY.md §7 hard-part 4).
* Skin albumentations (``dataset_ham.py:273-281``): Rotate±30, H/V flip,
  brightness/contrast, Gaussian blur, elastic transform.

All transforms take and return numpy arrays and an explicit ``np.random.Generator``
— deterministic per (seed, epoch, index), never global RNG state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# RandomGenerator (ACDC / generic)
# ---------------------------------------------------------------------------


def random_rot_flip(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    k = int(rng.integers(0, 4))
    image = np.rot90(image, k)
    label = np.rot90(label, k)
    axis = int(rng.integers(0, 2))
    image = np.flip(image, axis=axis).copy()
    label = np.flip(label, axis=axis).copy()
    return image, label


def random_rotate(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    angle = int(rng.integers(-20, 20))
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False)
    return image, label


def random_generator(image: np.ndarray, label: np.ndarray, out_size: int, rng: np.random.Generator):
    """The reference RandomGenerator: branch probabilities then zoom to out_size."""
    if rng.random() > 0.5:
        image, label = random_rot_flip(image, label, rng)
    elif rng.random() > 0.5:
        image, label = random_rotate(image, label, rng)
    h, w = image.shape
    if h != out_size or w != out_size:
        image = ndimage.zoom(image, (out_size / h, out_size / w), order=3)
        label = ndimage.zoom(label, (out_size / h, out_size / w), order=0)
    return image.astype(np.float32), label.astype(np.float32)


# ---------------------------------------------------------------------------
# Synapse imgaug-equivalent SomeOf pipeline
# ---------------------------------------------------------------------------


def _affine_pair(image, label, matrix, offset):
    """Apply an inverse-mapped affine to image (order-1, like imgaug default) and
    label (order-0)."""
    img = ndimage.affine_transform(image, matrix, offset=offset, order=1, mode="constant", cval=0.0)
    lab = ndimage.affine_transform(label, matrix, offset=offset, order=0, mode="constant", cval=0.0)
    return img, lab


def _center_affine(image, label, a, b, c, d):
    """Affine around the image center with forward matrix [[a,b],[c,d]]."""
    h, w = image.shape
    fwd = np.array([[a, b], [c, d]], np.float64)
    inv = np.linalg.inv(fwd)
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    offset = center - inv @ center
    return _affine_pair(image, label, inv, offset)


class SynapseAug:
    """SomeOf(0..4, random order) over the reference's 10 augmenters
    (``dataset_synapse.py:86-97``)."""

    N_OPS = 10

    def __call__(self, image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
        image = image.astype(np.float32)
        label = label.astype(np.float32)
        n = int(rng.integers(0, 5))
        ops = rng.permutation(self.N_OPS)[:n]
        for op in ops:
            image, label = self._apply(int(op), image, label, rng)
        return image, label

    def _apply(self, op, image, label, rng):
        if op == 0:  # Flipud(0.5)
            if rng.random() < 0.5:
                image, label = np.flipud(image).copy(), np.flipud(label).copy()
        elif op == 1:  # Fliplr(0.5)
            if rng.random() < 0.5:
                image, label = np.fliplr(image).copy(), np.fliplr(label).copy()
        elif op == 2:  # AdditiveGaussianNoise(0.005*255)
            image = image + rng.normal(0, 0.005 * 255, image.shape).astype(np.float32)
        elif op == 3:  # GaussianBlur(sigma=1.0)
            image = ndimage.gaussian_filter(image, 1.0)
        elif op == 4:  # LinearContrast(0.5..1.5); imgaug centers floats at 0.5,
            # uint8-range data at 127.5
            center = 0.5 if image.max() <= 1.5 else 127.5
            alpha = rng.uniform(0.5, 1.5)
            image = center + alpha * (image - center)
        elif op == 5:  # Affine scale x,y ∈ (0.5, 2)
            sx = rng.uniform(0.5, 2.0)
            sy = rng.uniform(0.5, 2.0)
            image, label = _center_affine(image, label, sy, 0, 0, sx)
        elif op == 6:  # Affine rotate ±40°
            theta = np.deg2rad(rng.uniform(-40, 40))
            image, label = _center_affine(image, label, np.cos(theta), -np.sin(theta), np.sin(theta), np.cos(theta))
        elif op == 7:  # Affine shear ±16°
            sh = np.tan(np.deg2rad(rng.uniform(-16, 16)))
            image, label = _center_affine(image, label, 1, sh, 0, 1)
        elif op == 8:  # PiecewiseAffine(0.008..0.03) ≈ smooth random displacement field
            scale = rng.uniform(0.008, 0.03)
            image, label = self._grid_distort(image, label, scale, rng)
        elif op == 9:  # Affine translate ±20%
            h, w = image.shape
            ty = rng.uniform(-0.2, 0.2) * h
            tx = rng.uniform(-0.2, 0.2) * w
            image = ndimage.shift(image, (ty, tx), order=1, mode="constant")
            label = ndimage.shift(label, (ty, tx), order=0, mode="constant")
        return image, label

    @staticmethod
    def _grid_distort(image, label, scale, rng, grid=4):
        """Smooth displacement field from a coarse jittered grid (PiecewiseAffine-like)."""
        h, w = image.shape
        disp = rng.normal(0, scale * min(h, w), (2, grid, grid))
        dy = ndimage.zoom(disp[0], (h / grid, w / grid), order=3)[:h, :w]
        dx = ndimage.zoom(disp[1], (h / grid, w / grid), order=3)[:h, :w]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([yy + dy, xx + dx])
        img = ndimage.map_coordinates(image, coords, order=1, mode="constant")
        lab = ndimage.map_coordinates(label, coords, order=0, mode="constant")
        return img, lab


# ---------------------------------------------------------------------------
# Skin (albumentations-equivalent)
# ---------------------------------------------------------------------------


class SkinAug:
    """Rotate(±30, p=.5) / HFlip(.5) / VFlip(.5) / RandomBrightnessContrast(.3) /
    GaussianBlur(.3) / ElasticTransform(.3) on HWC uint8 image + HW mask
    (``dataset_ham.py:273-281``)."""

    def __call__(self, image: np.ndarray, mask: np.ndarray, rng: np.random.Generator):
        if rng.random() < 0.5:
            angle = rng.uniform(-30, 30)
            image = self._rotate_img(image, angle)
            mask = self._rotate_mask(mask, angle)
        if rng.random() < 0.5:
            image, mask = image[:, ::-1].copy(), mask[:, ::-1].copy()
        if rng.random() < 0.5:
            image, mask = image[::-1].copy(), mask[::-1].copy()
        if rng.random() < 0.3:
            alpha = 1.0 + rng.uniform(-0.2, 0.2)
            beta = rng.uniform(-0.2, 0.2) * 255
            image = np.clip(alpha * image.astype(np.float32) + beta, 0, 255).astype(image.dtype)
        if rng.random() < 0.3:
            sigma = rng.uniform(0.5, 1.5)
            image = ndimage.gaussian_filter(image.astype(np.float32), (sigma, sigma, 0)).astype(image.dtype)
        if rng.random() < 0.3:
            image, mask = self._elastic(image, mask, rng)
        return image, mask

    @staticmethod
    def _rotate_img(image, angle):
        if cv2 is not None:
            h, w = image.shape[:2]
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            return cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR)
        return ndimage.rotate(image, angle, reshape=False, order=1)

    @staticmethod
    def _rotate_mask(mask, angle):
        if cv2 is not None:
            h, w = mask.shape[:2]
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            return cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST)
        return ndimage.rotate(mask, angle, reshape=False, order=0)

    @staticmethod
    def _elastic(image, mask, rng, alpha=34.0, sigma=4.0):
        h, w = mask.shape[:2]
        dy = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
        dx = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([yy + dy, xx + dx])
        if image.ndim == 3:
            img = np.stack(
                [ndimage.map_coordinates(image[..., c], coords, order=1, mode="reflect") for c in range(image.shape[-1])],
                axis=-1,
            )
        else:
            img = ndimage.map_coordinates(image, coords, order=1, mode="reflect")
        m = ndimage.map_coordinates(mask, coords, order=0, mode="reflect")
        return img.astype(image.dtype), m.astype(mask.dtype)
