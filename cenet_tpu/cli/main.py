"""Unified CLI: train/eval for all four workloads (replaces main_{synapse,acdc,skin}.py).

Usage:
    python -m cenet_tpu.cli.main train  --preset synapse --root_path .../Synapse --list_dir .../lists_Synapse
    python -m cenet_tpu.cli.main eval   --preset acdc --checkpoint path.npz ...
    python -m cenet_tpu.cli.main bench  --preset synapse
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser("cenet-tpu")
    p.add_argument("mode", choices=["train", "eval", "bench"])
    p.add_argument("--preset", required=True, choices=["synapse", "acdc", "ham10000", "ph2"])
    p.add_argument("--root_path", default=None)
    p.add_argument("--list_dir", default=None)
    p.add_argument("--output_dir", default="./model_out")
    p.add_argument("--checkpoint", default=None, help=".npz (ours) or .pth (torch) to load")
    p.add_argument("--pretrained_pth", default=None, help="pvt_v2_bX.pth encoder weights")
    p.add_argument("--model_version", default=None, choices=[None, "cenet", "cenet_org"])
    p.add_argument("--encoder", default=None,
                   help="backbone, e.g. pvt_v2_b2 / resnet50 (reference --encoder, main_synapse.py:139)")
    p.add_argument("--freeze_bb", action="store_true", default=None,
                   help="freeze backbone params (reference --freeze_bb)")
    p.add_argument("--steps_per_call", type=int, default=None,
                   help="optimizer steps per jit dispatch (scan); amortizes host latency")
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--base_lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--amp", action="store_true", default=None)
    p.add_argument("--no-amp", dest="amp", action="store_false")
    p.add_argument("--attn_impl", default=None, choices=[None, "xla", "chunked", "pallas", "ring"],
                   help="'ring' = sequence/context-parallel attention over the mesh 'seq' "
                        "axis (--mesh data,model,seq) for >224² inputs; falls back to "
                        "chunked/naive where the seq axis doesn't apply")
    p.add_argument("--eval_interval", type=int, default=None)
    p.add_argument("--throughput", action="store_true")
    p.add_argument("--resume", action="store_true", help="resume from the latest snapshot in the output dir")
    p.add_argument("--mesh", default=None,
                   help="data[,model[,seq]] device mesh, e.g. '8', '4,2', or '1,1,8' "
                        "(seq>1 enables the ring-attention axis); default: single device")
    # eval-protocol surface (reference scripts/synapse.sh TEST uses scale_factors
    # 1.0,0.75,0.5 vs TRAIN's 0.8,0.4 — FEA depends on these, synapse.sh:74,103)
    p.add_argument("--scale_factors", default=None, help="comma floats, e.g. '1.0,0.75,0.5'")
    p.add_argument("--diffatt_num_heads", default=None, help="comma ints, e.g. '16,8,8'")
    p.add_argument("--skip_mode", default=None, choices=[None, "add", "cat"])
    p.add_argument("--skip_use_command", default=None)
    p.add_argument("--is_savenii", action="store_true", help="export predictions as .nii.gz (eval)")
    p.add_argument("--save_figs", action="store_true",
                   help="per-case image/GT/pred figures during eval (utils_synapse.py:86) "
                        "/ skin contour overlays (utils_skin.py:155-157)")
    p.add_argument("--model_stats", action="store_true",
                   help="compile-and-print FLOPs/bytes at startup (main_acdc.py:128-132); "
                        "param count is always printed")
    p.add_argument("--z_spacing", type=int, default=None)
    # multi-host (DCN) initialization
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def make_config(args):
    from cenet_tpu.core.config import get_preset

    cfg = get_preset(args.preset)
    model, train, data = cfg.model, cfg.train, cfg.data
    if args.model_version:
        model = dataclasses.replace(model, model_version=args.model_version)
    if args.encoder:
        model = dataclasses.replace(model, encoder=args.encoder)
    if args.freeze_bb:
        model = dataclasses.replace(model, freeze_bb=True)
    if args.attn_impl:
        model = dataclasses.replace(model, attn_impl=args.attn_impl)
    if args.scale_factors:
        model = dataclasses.replace(model, scale_factors=tuple(float(s) for s in args.scale_factors.split(",")))
    if args.diffatt_num_heads:
        model = dataclasses.replace(model, diffatt_num_heads=tuple(int(s) for s in args.diffatt_num_heads.split(",")))
    if args.skip_mode:
        model = dataclasses.replace(model, skip_mode=args.skip_mode)
    if args.skip_use_command:
        model = dataclasses.replace(model, skip_use_command=args.skip_use_command)
    if args.z_spacing is not None:
        data = dataclasses.replace(data, z_spacing=args.z_spacing)
    for field, val in [("max_epochs", args.max_epochs), ("batch_size", args.batch_size),
                       ("base_lr", args.base_lr), ("seed", args.seed), ("amp", args.amp),
                       ("eval_interval", args.eval_interval), ("steps_per_call", args.steps_per_call)]:
        if val is not None:
            train = dataclasses.replace(train, **{field: val})
    if args.root_path:
        data = dataclasses.replace(data, root_path=args.root_path)
    if args.list_dir:
        data = dataclasses.replace(data, list_dir=args.list_dir)
    return cfg.replace(model=model, train=train, data=data, output_dir=args.output_dir)


def snapshot_path(cfg) -> str:
    t = cfg.train
    return os.path.join(
        cfg.output_dir,
        f"{cfg.data.dataset}_{cfg.model.model_version}_e{t.max_epochs}_bs{t.batch_size}"
        f"_lr{t.base_lr}_s{t.seed}{('_' + cfg.tag) if cfg.tag else ''}",
    )


def _datasets(cfg):
    d = cfg.data
    if d.dataset == "synapse":
        from cenet_tpu.data.synapse import SynapseDataset

        return (
            SynapseDataset(d.root_path, d.list_dir, "train", d.img_size),
            None,
            SynapseDataset(d.root_path, d.list_dir, "test_vol", d.img_size, preload=False),
        )
    if d.dataset == "acdc":
        from cenet_tpu.data.acdc import ACDCDataset

        return (
            ACDCDataset(d.root_path, d.list_dir, "train", d.img_size),
            ACDCDataset(d.root_path, d.list_dir, "valid", d.img_size),
            ACDCDataset(d.root_path, d.list_dir, "test", d.img_size, preload=False),
        )
    from cenet_tpu.data.skin import SkinDataset

    return (
        SkinDataset(d.dataset, d.root_path, "train", d.img_size),
        SkinDataset(d.dataset, d.root_path, "val", d.img_size),
        SkinDataset(d.dataset, d.root_path, "test", d.img_size),
    )


def _make_mesh(args, log):
    """Shared train/eval mesh setup; initializes multi-host DCN first if asked."""
    from cenet_tpu.core.mesh import MeshConfig, init_distributed, make_mesh

    init_distributed(getattr(args, "coordinator", None), getattr(args, "num_processes", None),
                     getattr(args, "process_id", None))
    if not getattr(args, "mesh", None):
        return None
    parts = [int(x) for x in args.mesh.split(",")]
    mesh = make_mesh(MeshConfig(
        data=parts[0],
        model=parts[1] if len(parts) > 1 else 1,
        seq=parts[2] if len(parts) > 2 else 1,
    ))
    log.info("mesh: %s", mesh)
    return mesh


def _place_state(trainer, state, dev, log):
    """Put the TrainState where the step functions expect it: on the mesh when one
    is configured (TP attention-projection shardings when the 'model' axis is >1 —
    the reference's vestigial ``model_parallel_size``, multihead_diffattn.py:39,
    made real), else on the single device."""
    import jax

    if trainer.mesh is None:
        return jax.device_put(state, dev)
    from cenet_tpu.core.mesh import TP_ATTENTION_RULES, shard_state

    tp = trainer.mesh.shape.get("model", 1) > 1
    if tp:
        log.info("tensor parallelism: sharding attention projections over 'model'=%d",
                 trainer.mesh.shape["model"])
    return shard_state(trainer.mesh, state, TP_ATTENTION_RULES if tp else None)


def run_train(cfg, args):
    import jax
    import jax.numpy as jnp

    from cenet_tpu.core.checkpoint import CheckpointManager, load_pretrained_encoder
    from cenet_tpu.core.logging_utils import ScalarWriter, Throughput, setup_logging
    from cenet_tpu.data.loader import Loader
    from cenet_tpu.train.trainer import Trainer

    snap = snapshot_path(cfg)
    log = setup_logging(snap, "train")
    log.info("config: %s", cfg)
    writer = ScalarWriter(os.path.join(snap, "tb"))

    tr_ds, vl_ds, te_ds = _datasets(cfg)
    bs = cfg.train.batch_size
    iters_per_epoch = len(tr_ds) // bs
    max_iterations = cfg.train.max_epochs * iters_per_epoch
    mesh = _make_mesh(args, log)
    trainer = Trainer(cfg, max_iterations, mesh=mesh, iters_per_epoch=iters_per_epoch)

    cpu = jax.local_devices(backend="cpu")
    dev = jax.devices()[0]
    with jax.default_device(cpu[0] if cpu else dev):
        state = trainer.init_state(
            jax.random.PRNGKey(cfg.train.seed), (1, cfg.data.img_size, cfg.data.img_size, cfg.model.input_channels)
        )
    # startup cost report (reference prints params+FLOPs at startup,
    # main_acdc.py:128-132); the FLOPs number needs a forward compile, so it is
    # gated behind --model_stats while the param count is always free
    from cenet_tpu.core.stats import count_params, print_model_stats

    log.info("model: %.2f M params", count_params(state.params) / 1e6)
    if getattr(args, "model_stats", False):
        print_model_stats(
            trainer.model, state.as_variables(),
            (1, cfg.data.img_size, cfg.data.img_size, cfg.model.input_channels),
            log=log.info, train=False,
        )
    pretrained = args.pretrained_pth
    if not pretrained and cfg.model.enc_pretrain:
        # reference default: train mode loads {base_ptdir}/{encoder}.pth
        # (encoder.py:75-84; forced off in eval mode, main_synapse.py:144)
        cand = os.path.join("pretrained_pth", "pvt", f"{cfg.model.encoder}.pth")
        if os.path.exists(cand):
            pretrained = cand
        else:
            log.warning("enc_pretrain=True but %s not found; training from scratch", cand)
    if pretrained:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = load_pretrained_encoder(variables, pretrained)
        state = dataclasses.replace(state, params=variables["params"], batch_stats=variables["batch_stats"])
        log.info("loaded pretrained encoder from %s", pretrained)
    state = _place_state(trainer, state, dev, log)

    spc_cfg = max(cfg.train.steps_per_call, 1)
    loader = Loader(
        len(tr_ds), tr_ds.get_train, bs, seed=cfg.train.seed,
        num_threads=cfg.data.num_workers, prefetch=spc_cfg + 2,
    )
    ckpt = CheckpointManager(snap, keep=cfg.train.ckpt_keep)
    meter = Throughput()
    best_val = best_test = 0.0
    rng = jax.random.PRNGKey(cfg.train.seed)
    it = 0
    start_epoch = 0
    if getattr(args, "resume", False) and ckpt.has_any():
        # Real step-level resume (the reference's --resume flag was dead,
        # main_synapse.py:63): the FULL TrainState — optimizer momentum included —
        # is restored via Orbax, so the continued run bit-matches an uninterrupted
        # one. Falls back to tagged snapshots when no step checkpoint exists.
        src = None
        if ckpt.latest_step() is not None:
            state = ckpt.restore_state(state)
            src = f"step {ckpt.latest_step()}"
        else:
            tag = ckpt.available_tags()[-1]
            state = ckpt.restore_state(state, tag=tag)
            src = f"tag {tag}"
        state = _place_state(trainer, state, dev, log)
        it = int(state.step)
        start_epoch = it // max(iters_per_epoch, 1)
        log.info("resumed from %s at iter %d (epoch %d, momentum restored)", src, it, start_epoch)
    spc = max(1, min(cfg.train.steps_per_call, iters_per_epoch))
    mstep = trainer.make_multi_step(spc) if spc > 1 else None
    pending = []
    curve_dice, curve_hd = [], []  # per-eval points for the end-of-training curves

    def put_batch(image, label, stacked=False):
        # mesh: global array sharded over 'data' (host-local shards on multi-host
        # slices — a plain device_put of a full array breaks there); single device:
        # plain transfer.
        if trainer.mesh is not None:
            from cenet_tpu.core.mesh import shard_host_local_batch

            sharded = shard_host_local_batch(trainer.mesh, {"i": image, "l": label}, stacked=stacked)
            return sharded["i"], sharded["l"]
        return jax.device_put(jnp.asarray(image), dev), jax.device_put(jnp.asarray(label), dev)

    def flush_pending():
        # epoch-boundary flush: run leftover (< spc) batches as single steps so
        # end-of-epoch eval/checkpoints see a fully-trained state
        nonlocal state, it
        while pending:
            b0 = pending.pop(0)
            im, lb = put_batch(b0["image"], b0["label"])
            state, _ = trainer.train_step(state, im, lb, jax.random.fold_in(rng, it))
            meter.step(bs)
            it += 1

    for epoch in range(start_epoch, cfg.train.max_epochs):
        for batch in loader.epoch(epoch):
            if mstep is None:
                images, labels = put_batch(batch["image"], batch["label"])
                state, loss = trainer.train_step(state, images, labels, jax.random.fold_in(rng, it))
                meter.step(bs)
                it += 1
            else:
                pending.append(batch)
                if len(pending) < spc:
                    continue
                images, labels = put_batch(
                    np.stack([b["image"] for b in pending]),
                    np.stack([b["label"] for b in pending]),
                    stacked=True,
                )
                pending = []
                state, loss = mstep(state, images, labels, jax.random.fold_in(rng, it))
                for _ in range(spc):
                    meter.step(bs)
                it += spc
            if it % 20 < spc:
                lv = float(loss)
                log.info("iter %d epoch %d loss %.5f lr %.6f %.1f img/s", it, epoch, lv,
                         float(trainer.schedule(it)), meter.images_per_sec)
                writer.scalar("info/criterion", lv, it)
                writer.scalar("info/lr", float(trainer.schedule(it)), it)
            if it % 100 < spc:
                # image/GT/prediction triptych every ~100 iters (main_synapse.py:285-293)
                try:
                    img0 = np.asarray(batch["image"][0])
                    img0 = (img0 - img0.min()) / max(img0.max() - img0.min(), 1e-6)
                    probs0 = np.asarray(trainer.eval_step(state, jnp.asarray(batch["image"][:1])))[0]
                    pred0 = probs0.argmax(-1) / max(cfg.model.num_classes - 1, 1)
                    gt0 = np.asarray(batch["label"][0]) / max(cfg.model.num_classes - 1, 1)
                    writer.image("train/Image", img0.transpose(2, 0, 1)[:1], it)
                    writer.image("train/Prediction", pred0[None], it)
                    writer.image("train/GroundTruth", gt0[None], it)
                except Exception:
                    pass
        flush_pending()
        # eval / checkpoint policies (reference: main_synapse.py:297-309,
        # main_acdc.py:270-283, main_skin.py:261-270)
        if cfg.data.dataset == "synapse":
            if (epoch + 1) >= cfg.train.max_epochs // 2 and (epoch + 1) % cfg.train.eval_interval == 0:
                ckpt.save(it, state, tag=f"epoch{epoch+1}")
                dice, hd = _volume_eval(trainer, state, te_ds, cfg)
                writer.scalar("info/test_dice", dice, it)
                writer.scalar("info/test_hd95", hd, it)
                curve_dice.append(dice)
                curve_hd.append(hd)
                log.info("epoch %d snapshot: test dice %.4f hd95 %.4f", epoch + 1, dice, hd)
        elif cfg.data.dataset == "acdc":
            val_d = _acdc_val(trainer, state, vl_ds, cfg)
            writer.scalar("info/val_dice", val_d, it)
            curve_dice.append(val_d)
            curve_hd.append(curve_hd[-1] if curve_hd else 0.0)
            log.info("epoch %d val dice %.4f", epoch, val_d)
            if val_d > best_val:
                best_val = val_d
                dice, hd = _volume_eval(trainer, state, te_ds, cfg)
                curve_hd[-1] = hd
                log.info("epoch %d test dice %.4f hd95 %.4f", epoch, dice, hd)
                if dice > best_test:
                    best_test = dice
                    ckpt.save_best(state, {"val_dice": val_d, "test_dice": dice, "epoch": epoch})
                    log.info("new best test dice %.4f (saved best)", dice)
        else:
            val_d = _quick_val(trainer, state, vl_ds, cfg)
            writer.scalar("info/val_dice", val_d, it)
            curve_dice.append(val_d)
            curve_hd.append(0.0)
            log.info("epoch %d val dice %.4f", epoch, val_d)
            if val_d > best_val:
                best_val = val_d
                from cenet_tpu.evaluate.skin import skin_test

                t_dice, t_acc, t_iou = skin_test(
                    lambda x: trainer.eval_step(state, x), _skin_batches(te_ds, cfg.train.batch_size)
                )
                log.info("epoch %d test dice %.4f acc %.4f iou %.4f", epoch, t_dice, t_acc, t_iou)
                if t_dice > best_test:
                    best_test = t_dice
                    ckpt.save_best(state, {"val_dice": val_d, "test_dice": t_dice, "epoch": epoch})
                    log.info("new best test dice %.4f (saved best)", t_dice)
        # rotating step checkpoint (keep=N) so --resume restores the latest epoch
        # boundary with optimizer momentum intact
        ckpt.save(it, state)
    ckpt.save(it, state, tag="final")
    if curve_dice:
        # end-of-training dice/hd95 curves + tsv (utils.py:18-37 via main_acdc.py:292)
        from cenet_tpu.evaluate.visualize import plot_metric_curves

        plot_metric_curves(curve_dice, curve_hd, snap)
        log.info("metric curves saved to %s/result.png|.tsv", snap)
    log.info("training done; throughput %.1f img/s", meter.images_per_sec)
    if args.throughput:
        print(json.dumps({"metric": "train_images_per_sec", "value": meter.images_per_sec}))
    return state


def _skin_batches(ds, bs):
    import jax.numpy as jnp

    n = len(ds)
    for i in range(0, n, bs):
        idxs = range(i, min(i + bs, n))
        yield {
            "image": jnp.stack([jnp.asarray(ds.get_eval(j)["image"]) for j in idxs]),
            "label": np.stack([ds.get_eval(j)["label"] for j in idxs]),
        }


def _quick_val(trainer, state, vl_ds, cfg):
    """Skin val: per-batch dice on argmax (utils_skin.py:97-113)."""
    from cenet_tpu.evaluate.skin import skin_val

    if vl_ds is None:
        return 0.0
    return skin_val(lambda x: trainer.eval_step(state, x), _skin_batches(vl_ds, cfg.train.batch_size))


def _acdc_val(trainer, state, vl_ds, cfg):
    """ACDC per-slice val dice at original resolution (metrics_eval.val_single_volume)."""
    from cenet_tpu.evaluate.metrics import dice_coefficient
    from cenet_tpu.evaluate.volume import VolumeInferenceConfig

    inf = _make_volume_inferencer(
        trainer, state,
        VolumeInferenceConfig(img_size=cfg.data.img_size, chunk=cfg.train.batch_size,
                              normalize=False, num_classes=cfg.model.num_classes),
    )
    dices = []
    for i in range(len(vl_ds)):
        s = vl_ds.get_eval(i)
        image, label = s["image"], s["label"]
        if image.ndim == 2:
            image, label = image[None], label[None]
        pred = inf.predict_volume(image)
        per_class = [dice_coefficient(pred == c, label == c) for c in range(1, cfg.model.num_classes)]
        dices.append(float(np.mean(per_class)))
    return float(np.mean(dices)) if dices else 0.0


def _make_volume_inferencer(trainer, state, vcfg):
    """Volume inferencer on the production fast path: per-chunk async dispatch
    (under --mesh the chunk batch rides the 'data' axis via eval_step's
    shardings) with fp16 volume upload. Scan-dispatch of chunk groups measured
    NEGATIVE here — see VolumeInferencer docstring."""
    from cenet_tpu.evaluate.volume import VolumeInferencer

    return VolumeInferencer(lambda x: trainer.eval_step(state, x), vcfg)


def _volume_eval(trainer, state, te_ds, cfg):
    from cenet_tpu.evaluate.volume import VolumeInferenceConfig, run_inference

    inf = _make_volume_inferencer(
        trainer, state,
        VolumeInferenceConfig(img_size=cfg.data.img_size,
                              normalize=(cfg.data.dataset == "synapse"),
                              num_classes=cfg.model.num_classes),
    )
    return run_inference(inf, list(te_ds.volumes()), full_metrics=(cfg.data.dataset == "acdc"))


def run_eval(cfg, args):
    import jax
    import jax.numpy as jnp

    from cenet_tpu.core.checkpoint import CheckpointManager, _load_npz
    from cenet_tpu.core.logging_utils import setup_logging
    from cenet_tpu.evaluate.volume import VolumeInferenceConfig, run_inference
    from cenet_tpu.train.trainer import Trainer

    snap = snapshot_path(cfg)
    log = setup_logging(snap, "eval")
    tr_ds, vl_ds, te_ds = _datasets(cfg)
    mesh = _make_mesh(args, log)  # sharded eval: batch rides the 'data' axis
    trainer = Trainer(cfg, max_iterations=1, mesh=mesh)
    cpu = jax.local_devices(backend="cpu")
    dev = jax.devices()[0]
    with jax.default_device(cpu[0] if cpu else dev):
        state = trainer.init_state(
            jax.random.PRNGKey(cfg.train.seed), (1, cfg.data.img_size, cfg.data.img_size, cfg.model.input_channels)
        )
    ckpt_path = args.checkpoint
    if ckpt_path and ckpt_path.endswith(".pth"):
        from cenet_tpu.convert.torch2jax import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(ckpt_path)
        variables, report = convert_state_dict(
            sd, {"params": state.params, "batch_stats": state.batch_stats}, cfg.model.model_version, strict=False
        )
        log.info("torch checkpoint: %d missing, %d unused", len(report["missing"]), len(report["unused"]))
        state = dataclasses.replace(state, params=variables["params"], batch_stats=variables["batch_stats"])
    elif ckpt_path and ckpt_path.endswith(".npz"):
        tree = _load_npz(ckpt_path)
        state = dataclasses.replace(state, params=tree["params"], batch_stats=tree["batch_stats"])
    elif ckpt_path and os.path.isdir(ckpt_path) and not any(
        os.path.isdir(os.path.join(ckpt_path, d)) for d in ("steps", "best", "final")
    ):
        # --checkpoint pointing directly at one Orbax tag dir (<snap>/best etc.)
        from cenet_tpu.core.checkpoint import restore_tag_dir

        state = restore_tag_dir(ckpt_path, state)
    else:
        # reference fallback order (main_acdc.py:158-160): best, then final, then
        # the numerically-greatest epoch snapshot. Validate the directory BEFORE
        # constructing CheckpointManager (whose __init__ makedirs) so a typo'd
        # --checkpoint path doesn't leave an empty orbax tree behind.
        root = ckpt_path or snap
        if not os.path.isdir(root):
            raise FileNotFoundError(f"no checkpoint in {root}; pass --checkpoint")
        mgr = CheckpointManager(root)
        tags = mgr.available_tags()
        if not tags and mgr.latest_step() is None:
            raise FileNotFoundError(f"no checkpoint in {root}; pass --checkpoint")
        tag = next((t for t in ("best", "final") if t in tags), tags[-1] if tags else None)
        state = mgr.restore_state(state, tag=tag)
        ckpt_path = f"{root} [{tag or mgr.latest_step()}]"
    state = _place_state(trainer, state, dev, log)
    log.info("loaded checkpoint %s", ckpt_path)

    if cfg.data.dataset in ("synapse", "acdc"):
        inf = _make_volume_inferencer(
            trainer, state,
            VolumeInferenceConfig(
                img_size=cfg.data.img_size,
                normalize=(cfg.data.dataset == "synapse"),
                num_classes=cfg.model.num_classes,
            ),
        )
        hooks = []
        if getattr(args, "save_figs", False):
            # per-case image/GT/pred triptych, saved unconditionally by the
            # reference test loop (utils_synapse.py:86); flag-gated here
            from cenet_tpu.evaluate.visualize import save_im_gt_pd

            fig_dir = os.path.join(snap, "figures")

            def fig_hook(case, pred):
                save_im_gt_pd(np.asarray(case["image"]), np.asarray(case["label"]), pred,
                              case.get("case_name", "case"), fig_dir)

            hooks.append(fig_hook)
            log.info("saving per-case figures to %s", fig_dir)
        if args.is_savenii:
            # reference --is_savenii: pred/img/gt exported per case with
            # (1, 1, z_spacing) spacing (utils_synapse.py:88-97)
            from cenet_tpu.evaluate.nifti import write_nifti

            nii_dir = os.path.join(snap, "predictions")
            os.makedirs(nii_dir, exist_ok=True)
            zsp = float(cfg.data.z_spacing)

            def nii_hook(case, pred):
                name = case.get("case_name", "case")
                write_nifti(os.path.join(nii_dir, f"{name}_pred.nii.gz"), pred.astype(np.uint8), (1.0, 1.0, zsp))
                write_nifti(os.path.join(nii_dir, f"{name}_img.nii.gz"), case["image"].astype(np.float32), (1.0, 1.0, zsp))
                write_nifti(os.path.join(nii_dir, f"{name}_gt.nii.gz"), case["label"].astype(np.uint8), (1.0, 1.0, zsp))

            hooks.append(nii_hook)
            log.info("saving nii.gz predictions to %s", nii_dir)
        save_hook = (lambda case, pred: [h(case, pred) for h in hooks]) if hooks else None
        dice, hd = run_inference(
            inf, list(te_ds.volumes()), full_metrics=(cfg.data.dataset == "acdc"), log=log, save_hook=save_hook
        )
        print(json.dumps({"mean_dice": dice, "mean_hd95": hd}))
    else:
        from cenet_tpu.evaluate.skin import skin_test

        bs = cfg.train.batch_size

        def batches():
            import jax.numpy as jnp

            n = len(te_ds)
            for i in range(0, n, bs):
                idxs = range(i, min(i + bs, n))
                yield {
                    "image": jnp.stack([jnp.asarray(te_ds.get_eval(j)["image"]) for j in idxs]),
                    "label": np.stack([te_ds.get_eval(j)["label"] for j in idxs]),
                }

        save_hook = None
        if getattr(args, "save_figs", False):
            # test-mode contour overlays (GT green / pred red), reference
            # utils_skin.py:155-157; one PNG per test case. Routed through
            # skin_test's save_hook so each batch is forwarded ONCE (a separate
            # overlay loop would double eval device time on the slow host link).
            from cenet_tpu.evaluate.visualize import skin_overlay

            fig_dir = os.path.join(snap, "figures")
            counter = [0]

            def save_hook(batch, pred):
                for j in range(pred.shape[0]):
                    skin_overlay(np.asarray(batch["image"][j]), np.asarray(batch["label"][j]),
                                 pred[j], os.path.join(fig_dir, f"te_{counter[0]}.png"))
                    counter[0] += 1

            log.info("saving overlays to %s", fig_dir)
        dice, acc, iou = skin_test(lambda x: trainer.eval_step(state, x), batches(), save_hook=save_hook)
        log.info("test dice %.4f acc %.4f iou %.4f", dice, acc, iou)
        print(json.dumps({"dice": dice, "acc": acc, "iou": iou}))


def main():
    args = build_argparser().parse_args()
    cfg = make_config(args)
    np.random.seed(cfg.train.seed)
    if args.mode == "train":
        run_train(cfg, args)
    elif args.mode == "eval":
        run_eval(cfg, args)
    else:
        os.execvp("python", ["python", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")])


if __name__ == "__main__":
    main()
