"""Data pipeline tests: loaders, determinism, augmentation invariants, synthetic
micro-datasets exercising the dataset classes end-to-end (SURVEY.md §4.3)."""

import os

import numpy as np
import pytest

from cenet_tpu.data.augment import SkinAug, SynapseAug, random_generator
from cenet_tpu.data.loader import Loader, seeded_epoch_order


def test_epoch_order_deterministic():
    a = seeded_epoch_order(100, seed=7, epoch=3)
    b = seeded_epoch_order(100, seed=7, epoch=3)
    c = seeded_epoch_order(100, seed=7, epoch=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(100))


def test_loader_batches_and_determinism():
    def get_sample(idx, rng):
        return {"image": np.full((4, 4, 1), idx, np.float32) + rng.random(), "label": np.int32(idx)}

    loader = Loader(10, get_sample, batch_size=3, seed=1)
    b1 = list(loader.epoch(0))
    b2 = list(loader.epoch(0))
    assert len(b1) == 3  # drop_last
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["image"], y["image"])
    assert b1[0]["image"].shape == (3, 4, 4, 1)


def test_loader_pool_matches_serial_order():
    """A 4-thread pool must yield identical batches in identical order to the
    single-thread loader (index-keyed RNG ⇒ scheduling can't change the data)."""
    import time

    def get_sample(idx, rng):
        time.sleep(0.001 * (idx % 5))  # jitter completion order across threads
        return {"image": np.full((2, 2), idx, np.float32) + rng.random()}

    serial = list(Loader(24, get_sample, batch_size=4, seed=3, num_threads=1).epoch(5))
    pooled = list(Loader(24, get_sample, batch_size=4, seed=3, num_threads=4).epoch(5))
    assert len(serial) == len(pooled) == 6
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_random_generator_output_shapes(rng):
    img = rng.standard_normal((256, 256)).astype(np.float32)
    lab = rng.integers(0, 4, (256, 256)).astype(np.float32)
    for seed in range(5):
        r = np.random.default_rng(seed)
        i2, l2 = random_generator(img, lab, 224, r)
        assert i2.shape == (224, 224) and l2.shape == (224, 224)
        assert set(np.unique(l2)).issubset({0.0, 1.0, 2.0, 3.0})


def test_synapse_aug_label_values_preserved(rng):
    """Augmentation must keep labels integral (order-0 warps everywhere)."""
    aug = SynapseAug()
    img = rng.standard_normal((128, 128)).astype(np.float32) * 100
    lab = rng.integers(0, 9, (128, 128)).astype(np.float32)
    for seed in range(8):
        r = np.random.default_rng(seed)
        i2, l2 = aug(img.copy(), lab.copy(), r)
        assert i2.shape == img.shape
        assert np.all(l2 == np.round(l2))
        assert l2.min() >= 0 and l2.max() <= 8


def test_skin_aug_mask_binary(rng):
    aug = SkinAug()
    img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    msk = (rng.random((96, 96)) > 0.5).astype(np.uint8)
    for seed in range(8):
        r = np.random.default_rng(seed)
        i2, m2 = aug(img.copy(), msk.copy(), r)
        assert i2.shape == img.shape and i2.dtype == np.uint8
        assert set(np.unique(m2)).issubset({0, 1})


@pytest.fixture
def synthetic_synapse(tmp_path):
    """4 train slices + 1 test volume in the reference's npz/h5 layout."""
    import h5py

    root = tmp_path / "synapse"
    lists = tmp_path / "lists"
    os.makedirs(root)
    os.makedirs(lists)
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        name = f"case0001_slice{i:03d}"
        np.savez(root / f"{name}.npz",
                 image=rng.random((256, 256)).astype(np.float32),
                 label=rng.integers(0, 9, (256, 256)).astype(np.float32))
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names) + "\n")
    with h5py.File(root / "case0008.npy.h5", "w") as f:
        f["image"] = rng.random((3, 256, 256)).astype(np.float32)
        f["label"] = rng.integers(0, 9, (3, 256, 256)).astype(np.float32)
    (lists / "test_vol.txt").write_text("case0008\n")
    return str(root), str(lists)


def test_synapse_dataset_end_to_end(synthetic_synapse):
    from cenet_tpu.data.synapse import SynapseDataset

    root, lists = synthetic_synapse
    tr = SynapseDataset(root, lists, "train", img_size=64)
    assert len(tr) == 4
    s = tr.get_train(0, np.random.default_rng(0))
    assert s["image"].shape == (64, 64, 1)
    assert s["label"].shape == (64, 64)
    assert s["label"].dtype == np.int32
    # Normalize(0.5, 0.5) applied after augmentation; additive-noise augmenters can
    # push values outside [-1, 1] (imgaug absolute-scale semantics), so just bound it
    assert np.isfinite(s["image"]).all()
    assert -30 < s["image"].min() and s["image"].max() < 30

    te = SynapseDataset(root, lists, "test_vol", img_size=64, preload=False)
    vol = te.get_volume(0)
    assert vol["image"].shape == (3, 256, 256)
    assert vol["case_name"] == "case0008"


@pytest.fixture
def synthetic_acdc(tmp_path):
    root = tmp_path / "acdc"
    lists = tmp_path / "lists_acdc"
    os.makedirs(root / "train")
    os.makedirs(lists)
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        name = f"patient001_frame01_slice_{i}.npz"
        np.savez(root / "train" / name,
                 img=rng.random((232, 256)).astype(np.float32),
                 label=rng.integers(0, 4, (232, 256)).astype(np.uint8))
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names) + "\n")
    np.savez(root / "patient002_volume.npz",
             img=rng.random((5, 232, 256)).astype(np.float32),
             label=rng.integers(0, 4, (5, 232, 256)).astype(np.uint8))
    (lists / "test.txt").write_text("patient002_volume.npz\n")
    return str(root), str(lists)


def test_acdc_dataset_end_to_end(synthetic_acdc):
    from cenet_tpu.data.acdc import ACDCDataset

    root, lists = synthetic_acdc
    tr = ACDCDataset(root, lists, "train", img_size=64)
    s = tr.get_train(1, np.random.default_rng(1))
    assert s["image"].shape == (64, 64, 1)
    te = ACDCDataset(root, lists, "test", img_size=64, preload=False)
    v = te.get_eval(0)
    assert v["image"].shape == (5, 232, 256)


@pytest.fixture
def synthetic_ph2(tmp_path):
    from PIL import Image

    root = tmp_path / "ph2"
    os.makedirs(root / "trainx")
    os.makedirs(root / "trainy")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
        msk = ((rng.random((64, 80)) > 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "trainx" / f"IMD{i:03d}.bmp")
        Image.fromarray(msk).save(root / "trainy" / f"IMD{i:03d}_lesion.bmp")
    return str(root)


def test_ph2_dataset_end_to_end(synthetic_ph2, monkeypatch):
    from cenet_tpu.data import skin as skin_mod

    # shrink the split table to the 6 synthetic images
    monkeypatch.setitem(skin_mod.SPLITS, "ph2", {"train": (0, 4), "val": (4, 5), "test": (5, 6)})
    ds = skin_mod.SkinDataset("ph2", synthetic_ph2, "train", img_size=32)
    assert len(ds) == 4
    s = ds.get_train(0, np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].min() >= 0.0 and s["image"].max() <= 1.0
    assert set(np.unique(s["label"])).issubset({0, 1})
    # cache file exists and is reused
    assert os.path.exists(os.path.join(synthetic_ph2, "np", "X_tr_32x32.npy"))
    ds2 = skin_mod.SkinDataset("ph2", synthetic_ph2, "test", img_size=32)
    assert len(ds2) == 1
