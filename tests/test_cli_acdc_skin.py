"""End-to-end CLI training for the ACDC and skin workloads on synthetic
micro-datasets — exercises the per-epoch val→test best-checkpoint cascades
(reference main_acdc.py:270-283, main_skin.py:261-270) that the Synapse e2e
test does not touch."""

import json
import os

import numpy as np
import pytest


def _slim(cfg, num_classes, in_ch, img=64):
    return cfg.replace(
        model=cfg.model.__class__(
            input_channels=in_ch, num_classes=num_classes, scale_factors=(1.0, 0.5),
            diffatt_num_heads=(2, 2, 2), encoder="pvt_v2_b0", drop_path_rate=0.0,
        ),
        data=cfg.data.__class__(dataset=cfg.data.dataset, root_path=cfg.data.root_path,
                                list_dir=cfg.data.list_dir, img_size=img),
    )


@pytest.fixture
def micro_acdc(tmp_path):
    root = tmp_path / "acdc"
    lists = tmp_path / "lists"
    os.makedirs(root / "train")
    os.makedirs(root / "valid")
    os.makedirs(lists)
    rng = np.random.default_rng(0)

    def slc():
        lab = np.zeros((48, 48), np.float32)
        lab[12:30, 12:30] = rng.integers(1, 4)
        return rng.random((48, 48)).astype(np.float32), lab

    tr, vl = [], []
    for i in range(4):
        img, lab = slc()
        name = f"patient{i:03d}_slice0.npz"
        np.savez(root / "train" / name, img=img, label=lab)
        tr.append(name)
    for i in range(2):
        img, lab = slc()
        name = f"patient1{i:02d}_slice0.npz"
        np.savez(root / "valid" / name, img=img, label=lab)
        vl.append(name)
    img3 = rng.random((2, 48, 48)).astype(np.float32)
    lab3 = np.zeros((2, 48, 48), np.float32)
    lab3[:, 12:30, 12:30] = 2
    np.savez(root / "patient200_volume.npz", img=img3, label=lab3)
    (lists / "train.txt").write_text("\n".join(tr) + "\n")
    (lists / "valid.txt").write_text("\n".join(vl) + "\n")
    (lists / "test.txt").write_text("patient200_volume.npz\n")
    return str(root), str(lists)


def test_train_micro_acdc_cascade(micro_acdc, tmp_path):
    from cenet_tpu.cli.main import build_argparser, make_config, run_train, snapshot_path

    root, lists = micro_acdc
    out = str(tmp_path / "out")
    args = build_argparser().parse_args([
        "train", "--preset", "acdc", "--root_path", root, "--list_dir", lists,
        "--output_dir", out, "--max_epochs", "1", "--batch_size", "2", "--no-amp",
    ])
    cfg = _slim(make_config(args), num_classes=4, in_ch=1)
    run_train(cfg, args)
    snap = snapshot_path(cfg)
    assert os.path.exists(os.path.join(snap, "log_train.txt"))
    # the val→test cascade must have produced a best checkpoint (val dice > 0 on
    # epoch 0 beats best_val=0) and the final tag always exists
    entries = os.listdir(snap)
    assert "final" in entries, entries
    assert "best" in entries, entries
    assert os.path.exists(os.path.join(snap, "metrics_best.json"))


@pytest.fixture
def micro_ph2(tmp_path):
    from PIL import Image

    root = tmp_path / "ph2"
    os.makedirs(root / "trainx")
    os.makedirs(root / "trainy")
    rng = np.random.default_rng(0)
    # PH2 split indices are 0-80 / 80-100 / 100-200 (dataset_ph2.py:54-64);
    # 104 tiny images give train 80 / val 20 / test 4
    for i in range(104):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        msk = np.zeros((32, 32), np.uint8)
        msk[8:24, 8:24] = 255
        Image.fromarray(img).save(root / "trainx" / f"IMD{i:03d}.bmp")
        Image.fromarray(msk).save(root / "trainy" / f"IMD{i:03d}_lesion.bmp")
    return str(root)


def test_train_micro_ph2_cascade(micro_ph2, tmp_path):
    from cenet_tpu.cli.main import build_argparser, make_config, run_eval, run_train, snapshot_path

    out = str(tmp_path / "out")
    args = build_argparser().parse_args([
        "train", "--preset", "ph2", "--root_path", micro_ph2,
        "--output_dir", out, "--max_epochs", "1", "--batch_size", "4", "--no-amp",
    ])
    cfg = _slim(make_config(args), num_classes=2, in_ch=3, img=32)
    run_train(cfg, args)
    snap = snapshot_path(cfg)
    assert os.path.exists(os.path.join(snap, "log_train.txt"))
    entries = os.listdir(snap)
    assert "final" in entries, entries
    assert "best" in entries, entries  # val dice > 0 ⇒ cascade fired

    # eval auto-falls back to the best tag (reference main_skin.py:163-165)
    args_eval = build_argparser().parse_args([
        "eval", "--preset", "ph2", "--root_path", micro_ph2, "--output_dir", out,
    ])
    run_eval(cfg, args_eval)
    assert os.path.exists(os.path.join(snap, "log_eval.txt"))
