"""CLI-level tensor-parallel mesh path + observability wiring (VERDICT r2 #4/#6).

Runs the real ``run_train``/``run_eval`` entry points with ``--mesh 4,2`` on the
virtual 8-device CPU mesh: TP_ATTENTION_RULES must be applied by the CLI itself
(round 2 left them test-only and ``run_eval`` re-pinned params replicated), the
multi-step stacked-batch path must ride ``shard_host_local_batch``, and the
eval figures / metric-curve call sites must produce files.
"""

import os

import h5py
import numpy as np
import pytest


@pytest.fixture
def micro_synapse8(tmp_path):
    """8 train slices so steps_per_call=2 at bs=4 exercises the stacked path."""
    root = tmp_path / "synapse"
    lists = tmp_path / "lists"
    os.makedirs(root)
    os.makedirs(lists)
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        name = f"case0001_slice{i:03d}"
        lab = np.zeros((96, 96), np.float32)
        lab[20:60, 20:60] = 1.0
        np.savez(root / f"{name}.npz", image=rng.random((96, 96)).astype(np.float32), label=lab)
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names) + "\n")
    with h5py.File(root / "case0008.npy.h5", "w") as f:
        lab3 = np.zeros((2, 96, 96), np.float32)
        lab3[:, 20:60, 20:60] = 1.0
        f["image"] = rng.random((2, 96, 96)).astype(np.float32)
        f["label"] = lab3
    (lists / "test_vol.txt").write_text("case0008\n")
    return str(root), str(lists)


def _small_cfg(cfg, root, lists):
    return cfg.replace(
        model=cfg.model.__class__(
            input_channels=1, num_classes=2, scale_factors=(0.8, 0.4),
            diffatt_num_heads=(2, 2, 2), encoder="pvt_v2_b0", drop_path_rate=0.0,
            attn_impl=cfg.model.attn_impl,  # keep the CLI's --attn_impl routing
        ),
        data=cfg.data.__class__(dataset="synapse", root_path=root, list_dir=lists, img_size=64),
    )


def test_cli_train_eval_tp_mesh(micro_synapse8, tmp_path):
    from cenet_tpu.cli.main import build_argparser, make_config, run_eval, run_train, snapshot_path

    root, lists = micro_synapse8
    out = str(tmp_path / "out")
    argv = [
        "train", "--preset", "synapse", "--root_path", root, "--list_dir", lists,
        "--output_dir", out, "--max_epochs", "1", "--batch_size", "4", "--no-amp",
        "--mesh", "4,2", "--steps_per_call", "2", "--eval_interval", "1",
        "--attn_impl", "chunked",
    ]
    args = build_argparser().parse_args(argv)
    cfg = _small_cfg(make_config(args), root, lists)
    assert cfg.train.steps_per_call == 2  # --steps_per_call reached the config
    run_train(cfg, args)

    snap = snapshot_path(cfg)
    log = open(os.path.join(snap, "log_train.txt")).read()
    # the CLI itself applied the TP rules (not just tests/dryrun)
    assert "tensor parallelism: sharding attention projections over 'model'=2" in log, log[-2000:]
    assert os.path.isdir(os.path.join(snap, "final"))
    # end-of-training metric curves + tsv (utils.py:18-37 parity)
    assert os.path.exists(os.path.join(snap, "result.png"))
    tsv = open(os.path.join(snap, "result.tsv")).read()
    assert tsv.startswith("epoch\tdice\thd95"), tsv
    assert "M params" in log  # startup cost line

    # eval through the CLI with the same mesh: must NOT re-pin replicated, and
    # --save_figs must produce the per-case triptych
    args_eval = build_argparser().parse_args(
        ["eval", "--preset", "synapse", "--root_path", root, "--list_dir", lists,
         "--output_dir", out, "--mesh", "4,2", "--save_figs", "--attn_impl", "chunked"]
    )
    run_eval(cfg, args_eval)  # same cfg → same snapshot dir as the train run
    elog = open(os.path.join(snap, "log_eval.txt")).read()
    assert "tensor parallelism" in elog, elog[-2000:]
    figs = os.listdir(os.path.join(snap, "figures"))
    assert any(f.startswith("te_case0008") for f in figs), figs


def test_cli_train_ring_seq_mesh(micro_synapse8, tmp_path):
    """--attn_impl ring --mesh 1,1,8 trains through the CLI (VERDICT r4 #4):
    tokens shard over the 'seq' axis, k/v ride the ppermute ring. At img 64 the
    DSEB token dims (256/64/16) divide the 8-way seq axis so the ring engages
    there; non-dividing sites (e.g. the 2² Nonlocal) exercise the fallback."""
    from cenet_tpu.cli.main import build_argparser, make_config, run_train, snapshot_path

    root, lists = micro_synapse8
    out = str(tmp_path / "out_ring")
    argv = [
        "train", "--preset", "synapse", "--root_path", root, "--list_dir", lists,
        "--output_dir", out, "--max_epochs", "1", "--batch_size", "8", "--no-amp",
        "--mesh", "1,1,8", "--attn_impl", "ring", "--steps_per_call", "1",
        "--eval_interval", "5",  # skip the volume eval: this test gates training
    ]
    args = build_argparser().parse_args(argv)
    cfg = _small_cfg(make_config(args), root, lists)
    assert cfg.model.attn_impl == "ring"
    run_train(cfg, args)
    snap = snapshot_path(cfg)
    log = open(os.path.join(snap, "log_train.txt")).read()
    assert "seq" in log, log[-2000:]  # the 3-axis mesh reached run_train's log
    assert os.path.isdir(os.path.join(snap, "final"))
    assert "loss" in log


def test_eval_checkpoint_fallback_prefers_best_then_final(tmp_path):
    """ADVICE r2 medium: tags[-1] used to pick the last epochN tag over 'final',
    and epoch tags sorted lexicographically ('epoch80' > 'epoch120')."""
    from cenet_tpu.core.checkpoint import CheckpointManager

    d = str(tmp_path / "snap")
    for t in ("epoch80", "epoch120", "final"):
        os.makedirs(os.path.join(d, t))
    mgr = CheckpointManager(d)
    tags = mgr.available_tags()
    assert tags == ["final", "epoch80", "epoch120"], tags
    tag = next((t for t in ("best", "final") if t in tags), tags[-1])
    assert tag == "final"
    os.makedirs(os.path.join(d, "best"))
    tags = CheckpointManager(d).available_tags()
    assert tags[0] == "best"


def test_eval_missing_checkpoint_does_not_create_dirs(micro_synapse8, tmp_path):
    """ADVICE r2: a typo'd --checkpoint must not leave an empty orbax tree."""
    from cenet_tpu.cli.main import build_argparser, make_config, run_eval

    root, lists = micro_synapse8
    bogus = str(tmp_path / "no_such_dir")
    args = build_argparser().parse_args(
        ["eval", "--preset", "synapse", "--root_path", root, "--list_dir", lists,
         "--output_dir", str(tmp_path / "out2"), "--checkpoint", bogus]
    )
    cfg = _small_cfg(make_config(args), root, lists)
    with pytest.raises(FileNotFoundError):
        run_eval(cfg, args)
    assert not os.path.exists(bogus)
