"""Skin lesion datasets: HAM10000 and PH2 (reference ``datasets/skin/``).

One-time preprocessing decodes/resizes every image+mask to 224² and caches them as
``np/X_*.npy`` / ``np/Y_*.npy`` (reference ``dataset_ham.py:140-263``); the dataset
then serves uint8 HWC images with min-max-normalized float output and fixed
index-based splits: HAM 7200/1800/1015, PH2 80/20/100.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Tuple

import numpy as np

from cenet_tpu.data.augment import SkinAug

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None
from PIL import Image

SPLITS = {
    "ham10000": {"train": (0, 7200), "val": (7200, 9000), "test": (9000, 10015)},
    "ph2": {"train": (0, 80), "val": (80, 100), "test": (100, 200)},
}


def _resize_img(arr: np.ndarray, size: int, nearest: bool = False) -> np.ndarray:
    if cv2 is not None:
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(arr, (size, size), interpolation=interp)
    img = Image.fromarray(arr)
    img = img.resize((size, size), Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(img)


def prepare_skin_cache(dataset: str, root: str, img_size: int = 224) -> Tuple[str, str]:
    """Decode + resize + cache all images/masks; returns (x_path, y_path).

    HAM10000 layout: images/ISIC_*.jpg + masks/ISIC_*_segmentation.png
    PH2 layout:      trainx/IMD*.bmp + trainy/IMD*_lesion.bmp
    """
    np_dir = os.path.join(root, "np")
    os.makedirs(np_dir, exist_ok=True)
    x_path = os.path.join(np_dir, f"X_tr_{img_size}x{img_size}.npy")
    y_path = os.path.join(np_dir, f"Y_tr_{img_size}x{img_size}.npy")
    if os.path.exists(x_path) and os.path.exists(y_path):
        return x_path, y_path

    if dataset == "ham10000":
        img_files = sorted(glob.glob(os.path.join(root, "images", "ISIC_*.jpg")))
        mask_for = lambda p: os.path.join(
            root, "masks", os.path.basename(p).replace(".jpg", "_segmentation.png")
        )
    else:
        img_files = sorted(glob.glob(os.path.join(root, "trainx", "IMD*.bmp")))
        mask_for = lambda p: os.path.join(
            root, "trainy", os.path.basename(p).replace(".bmp", "_lesion.bmp")
        )
    assert img_files, f"no images found under {root}"

    xs = np.zeros((len(img_files), img_size, img_size, 3), np.uint8)
    ys = np.zeros((len(img_files), img_size, img_size), np.uint8)
    for i, p in enumerate(img_files):
        img = np.asarray(Image.open(p).convert("RGB"))
        msk = np.asarray(Image.open(mask_for(p)).convert("L"))
        xs[i] = _resize_img(img, img_size)
        ys[i] = (_resize_img(msk, img_size, nearest=True) > 127).astype(np.uint8)
    np.save(x_path, xs)
    np.save(y_path, ys)
    return x_path, y_path


def _minmax(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    lo, hi = x.min(), x.max()
    out = (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)
    return np.nan_to_num(out)


class SkinDataset:
    def __init__(self, dataset: str, root: str, split: str, img_size: int = 224):
        assert dataset in SPLITS
        x_path, y_path = prepare_skin_cache(dataset, root, img_size)
        lo, hi = SPLITS[dataset][split]
        xs = np.load(x_path, mmap_mode="r")
        ys = np.load(y_path, mmap_mode="r")
        hi = min(hi, len(xs))
        self.images = np.asarray(xs[lo:hi])  # uint8 HWC
        self.labels = np.asarray(ys[lo:hi])
        self.split = split
        self.aug = SkinAug()

    def __len__(self):
        return len(self.images)

    def get_train(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        img, msk = self.images[idx].copy(), self.labels[idx].copy()
        img, msk = self.aug(img, msk, rng)
        return {"image": _minmax(img), "label": msk.astype(np.int32)}

    def get_eval(self, idx: int) -> Dict[str, np.ndarray]:
        return {"image": _minmax(self.images[idx]), "label": self.labels[idx].astype(np.int32)}
