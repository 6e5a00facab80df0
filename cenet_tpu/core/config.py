"""Typed experiment configuration with per-dataset presets.

Replaces the reference's ~50 argparse flags duplicated per entry point
(``main_synapse.py:23-79`` etc.) and the canonical values pinned in
``scripts/{synapse,acdc,skin}.sh``. Dead reference flags (--throughput, --resume,
--zip, ...) are either implemented for real (throughput, resume) or dropped.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    model_version: str = "cenet"  # 'cenet' | 'cenet_org'
    encoder: str = "pvt_v2_b2"
    enc_pretrain: bool = True
    freeze_bb: bool = False
    input_channels: int = 1
    num_classes: int = 9
    scale_factors: Tuple[float, ...] = (0.8, 0.4)
    diffatt_num_heads: Tuple[int, ...] = (2, 2, 2)
    skip_mode: str = "cat"
    skip_use_command: str = "dat-fea"
    dec_up_block: str = "eucb"
    out_merge_mode: str = "cat"
    out_up_block: str = "upcn"
    out_up_ks: int = 3
    drop_path_rate: float = 0.1
    attn_impl: str = "pallas"  # 'xla' (naive parity) | 'chunked' | 'pallas' (chunked fallback off-TPU)


@dataclass(frozen=True)
class TrainConfig:
    max_epochs: int = 250
    batch_size: int = 8
    base_lr: float = 0.015
    optimizer: str = "sgd"
    scheduler: str = "poly"
    weight_decay: float = 1e-4
    loss_type: str = "boundary"
    loss_weights: str = "1.0"
    amp: bool = True  # bf16 compute policy on TPU
    grad_accum_steps: int = 1
    steps_per_call: int = 1  # optimizer steps per dispatch (scan); amortizes host latency
    grad_clip: float = 0.0
    remat: bool = False  # jax.checkpoint over encoder stages
    seed: int = 1234
    eval_interval: int = 20
    ckpt_keep: int = 3


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synapse"  # synapse | acdc | ham10000 | ph2
    root_path: str = "./data"
    list_dir: str = "./lists"
    img_size: int = 224
    z_spacing: int = 1
    num_workers: int = 4


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    output_dir: str = "./model_out"
    tag: str = ""

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Canonical presets (from the reference shell scripts, SURVEY.md §2.6)
# ---------------------------------------------------------------------------


def get_preset(name: str) -> ExperimentConfig:
    name = name.lower()
    if name == "synapse":
        # scripts/synapse.sh:49-85
        return ExperimentConfig(
            model=ModelConfig(
                input_channels=1, num_classes=9, scale_factors=(0.8, 0.4),
                diffatt_num_heads=(16, 8, 8), skip_mode="cat", dec_up_block="eucb",
                out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
            ),
            train=TrainConfig(
                max_epochs=250, batch_size=8, base_lr=0.015, optimizer="sgd",
                scheduler="poly", loss_type="boundary", loss_weights="1.0",
                eval_interval=20, steps_per_call=10,
            ),
            data=DataConfig(dataset="synapse", z_spacing=1),
        )
    if name == "acdc":
        # scripts/acdc.sh:44-80
        return ExperimentConfig(
            model=ModelConfig(
                input_channels=1, num_classes=4, scale_factors=(1.0, 0.5),
                diffatt_num_heads=(4, 4, 4), skip_mode="cat", dec_up_block="eucb",
                out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
            ),
            train=TrainConfig(
                max_epochs=120, batch_size=8, base_lr=0.01, optimizer="sgd",
                scheduler="poly", loss_type="boundary", loss_weights="1.0",
                steps_per_call=10,
            ),
            data=DataConfig(dataset="acdc"),
        )
    if name in ("ham10000", "ham"):
        # scripts/skin.sh:45-105 (HAM)
        return ExperimentConfig(
            model=ModelConfig(
                input_channels=3, num_classes=2, scale_factors=(1.0, 0.75, 0.5),
                diffatt_num_heads=(2, 2, 2), skip_mode="cat", dec_up_block="eucb",
                out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
            ),
            train=TrainConfig(
                max_epochs=5, batch_size=8, base_lr=0.01, optimizer="sgd",
                scheduler="poly", loss_type="dice,ce", loss_weights="0.5,0.5",
            ),
            data=DataConfig(dataset="ham10000"),
        )
    if name == "ph2":
        # scripts/skin.sh:45-105 (PH2: loss weights 0.7,0.3)
        return ExperimentConfig(
            model=ModelConfig(
                input_channels=3, num_classes=2, scale_factors=(1.0, 0.75, 0.5),
                diffatt_num_heads=(2, 2, 2), skip_mode="cat", dec_up_block="eucb",
                out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
            ),
            train=TrainConfig(
                max_epochs=5, batch_size=8, base_lr=0.01, optimizer="sgd",
                scheduler="poly", loss_type="dice,ce", loss_weights="0.7,0.3",
            ),
            data=DataConfig(dataset="ph2"),
        )
    raise KeyError(f"unknown preset: {name}")
