"""Device mesh and sharding layer — the framework's communication backend.

The reference has no distributed backend at all (single-process ``nn.DataParallel``,
``main_synapse.py:210-211``; no torch.distributed anywhere). Here distribution is
first-class and TPU-native (SURVEY.md §2.7):

* a ``Mesh`` over the slice's chips with axes ``('data', 'model')`` — gradients ride
  ICI via the collectives XLA inserts for sharded reductions;
* batch sharded over 'data' (pure DP by default, model=1);
* optional 'model' axis for head-sharded attention weights (TP);
* multi-host: ``jax.distributed.initialize`` + per-host data feeding over DCN.

No hand-written collectives: we annotate shardings with ``NamedSharding`` /
``with_sharding_constraint`` and let GSPMD place psum/all-gather on the ICI links.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1
    # Sequence/context-parallel axis for >224² inputs (SURVEY §2.7 row SP/CP):
    # attention token dims shard over 'seq' and k/v rotate via ring ppermute
    # (ops/ring_attention.py). 1 (default) omits the axis entirely so existing
    # 2-axis meshes/specs are unchanged.
    seq: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model, 1)
    seq = max(cfg.seq, 1)
    data = cfg.data if cfg.data > 0 else n // (model * seq)
    assert data * model * seq == n, f"mesh {data}x{seq}x{model} != {n} devices"
    if seq > 1:
        arr = np.asarray(devices).reshape(data, seq, model)
        return Mesh(arr, axis_names=("data", "seq", "model"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host initialization over DCN (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis (NHWC / NL / scalar batches)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along dim 0 over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_params(mesh: Mesh, params, rules=None):
    """Place parameters on the mesh.

    Default: fully replicated (pure DP). With ``rules`` (list of (path-substring,
    PartitionSpec)), matching parameters are sharded — used for head-sharded (TP)
    attention projections over the 'model' axis.
    """
    rep = replicated(mesh)

    def place(path, x):
        if rules:
            pstr = "/".join(str(getattr(k, "key", k)) for k in path)
            for substr, spec in rules:
                if substr in pstr and len(x.shape) >= len([s for s in spec if s is not None]):
                    return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_host_local_batch(mesh: Mesh, batch, stacked: bool = False):
    """Multi-host batch placement: each host contributes its local shard of the
    global batch, assembled into one global array sharded over 'data'.

    ``stacked=False``: batch dim is axis 0 → P('data').
    ``stacked=True``: arrays carry a leading (steps,) axis with the batch at axis 1
    (multi-step dispatch) → P(None, 'data').

    On a single host this is a plain sharded device_put. On multi-host slices the
    loader feeds only ``global_batch / process_count`` samples per host and the
    assembly rides DCN-free (data stays on the host's own devices).
    """
    sh = NamedSharding(mesh, P(None, "data") if stacked else P("data"))

    def place(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(place, batch)


def shard_state(mesh: Mesh, state, rules=None):
    """Place a full TrainState on the mesh: params AND the optimizer state (whose
    momentum mirrors the param tree, so TP ``rules`` match its paths too) get the
    rule-based placement; batch_stats / step / everything else is replicated.

    This is the production entry for tensor parallelism: with
    ``rules=TP_ATTENTION_RULES`` the attention projections — and their momentum
    buffers — shard over 'model' instead of being duplicated per model-axis pair.
    """
    import dataclasses as _dc

    if not hasattr(state, "params"):
        return shard_params(mesh, state, rules)
    rep = replicated(mesh)
    return _dc.replace(
        state,
        params=shard_params(mesh, state.params, rules),
        batch_stats=jax.tree.map(lambda a: jax.device_put(a, rep), state.batch_stats),
        opt_state=shard_params(mesh, state.opt_state, rules),
        step=jax.device_put(state.step, rep),
    )


# Attention-mesh registry: the attention routers (ops/flash_attention.py) read
# this at trace time to wrap fused cores in shard_map over the TP head axis when
# the impl string carries an '@axis' suffix (e.g. 'pallas@model'). Trainer
# registers its mesh on construction; None disables the wrap (pure-GSPMD path).
_ATTENTION_MESH: Optional[Mesh] = None


def set_attention_mesh(mesh: Optional[Mesh]) -> None:
    global _ATTENTION_MESH
    _ATTENTION_MESH = mesh


def get_attention_mesh() -> Optional[Mesh]:
    return _ATTENTION_MESH


# Tensor-parallel rules for the diff-attention / SRA projections: shard the output
# features of q/k/v (head dim) and the input features of the out-projection over
# 'model'. GSPMD then runs per-device head groups with an all-reduce on out_proj.
#
# Composition with the Pallas attention cores: GSPMD does not partition
# pallas_call custom calls — under TP it would insert gathers so the fused kernel
# runs on replicated operands (semantically correct; TP still shards the
# projection matmuls). With an '@model'-suffixed attn_impl (set automatically by
# the CLI when --mesh has model>1) the routers instead wrap the core in
# shard_map over 'model', so the fused kernels run HEAD-LOCAL per device
# (ops/flash_attention.shard_heads; equivalence tested on the virtual CPU mesh
# with the chunked core and with the Pallas kernels in interpret mode,
# tests/test_tp_attention.py).
TP_ATTENTION_RULES = [
    ("q_proj/weight", P(None, "model")),
    ("k_proj/weight", P(None, "model")),
    ("v_proj/weight", P(None, "model")),
    ("out_proj/weight", P("model", None)),
    ("attn/q/weight", P(None, "model")),
    ("attn/kv/weight", P(None, "model")),
    ("attn/proj/weight", P("model", None)),
]
