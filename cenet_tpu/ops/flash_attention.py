"""Memory-efficient attention cores for TPU.

The model's hot attention sites (SURVEY.md §3.1) run at N=3136 tokens with up to 32
attention maps per example; materializing the full (B, H, N, N) map in fp32 is
4.8 GB and OOMs the 16 GB v5e HBM in the backward pass. Two cores avoid that:

* ``chunked_attention_core`` — pure-XLA ``lax.scan`` over query blocks. Each block
  computes its full softmax row (K fits comfortably), so numerics are *identical*
  to the naive path (same fp32 softmax, no online-max accumulation); the backward
  rematerializes per-block (``jax.checkpoint``), so peak memory is O(N·chunk).
* ``flash_attention_core`` — fused Pallas TPU kernel (``cenet_tpu/ops/pallas_attention.py``)
  with a custom VJP, falling back to the chunked core off-TPU or for unsupported
  shapes.

Diff-attention composes on top: (A₁ − λA₂)·V = A₁V − λ·A₂V, so the two softmax
groups are two core calls (see ``nn/attention.py``) — no fused N² tensor ever
exists.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Full-map fp32 footprint below which the naive fused-XLA path beats the Pallas
# kernels (grid/padding overhead). Module-level so tests can shrink it to force
# kernel routing at toy shapes.
_SMALL_LIMIT = 32 * 1024 * 1024


def _softmax_fp32(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    y = jax.nn.softmax(x.astype(jnp.float32), axis=axis)
    return y.astype(x.dtype)


def parse_impl(impl: str) -> Tuple[str, Optional[str]]:
    """Split an attention-impl string into (core, tp_axis).

    ``'pallas@model'`` → ``('pallas', 'model')``: run the core head-local per
    device via shard_map over the named mesh axis (tensor parallelism). A bare
    ``'pallas'``/``'chunked'``/``'xla'`` has no axis (GSPMD-only placement).
    """
    if "@" in impl:
        core, axis = impl.split("@", 1)
        return core, axis
    return impl, None


def _pallas_routable() -> bool:
    """Pallas kernels compile on real TPU, or anywhere under the test-only
    interpreter flag (ops.pallas_attention._INTERPRET)."""
    from cenet_tpu.ops import pallas_attention as _pa

    return jax.default_backend() not in ("cpu", "gpu") or _pa._INTERPRET


_WARNED_BATCH_REPLICATION = set()


def _head_shard_specs(mesh, axis: str, nheads: int, batch: int):
    """shard_map specs for (B, H, ...) attention operands, or None if the head
    count doesn't divide over the axis. Batch rides 'data' when divisible."""
    m = mesh.shape.get(axis, 1)
    if m <= 1 or nheads % m:
        return None
    db = None
    if axis != "data" and mesh.shape.get("data", 1) > 1:
        if batch % mesh.shape["data"] == 0:
            db = "data"
        elif batch not in _WARNED_BATCH_REPLICATION:
            # P(None, axis) is semantically correct but forces GSPMD to
            # all-gather activations over 'data' on every attention call — a
            # silent performance cliff for non-divisible batches (e.g.
            # remainder eval chunks). Make it visible, once per batch size.
            _WARNED_BATCH_REPLICATION.add(batch)
            import logging

            logging.getLogger(__name__).warning(
                "TP attention: batch %d does not divide the data axis (%d); "
                "activations will be replicated over 'data' for these calls "
                "(all-gather per attention). Pad the batch to a multiple of "
                "the data axis to avoid this.",
                batch, mesh.shape["data"],
            )
    return P(db, axis)


def shard_heads(core, axis: Optional[str]):
    """Wrap a ``core(q, k, v)`` attention fn to run head-local under TP.

    With a registered mesh (core/mesh.set_attention_mesh) and a divisible head
    count, the core runs inside shard_map over ``axis`` — each device computes
    only its own heads, so fused Pallas kernels stay head-local instead of being
    all-gathered by GSPMD (which cannot partition custom calls). Falls through
    to the bare core whenever the mesh/axis/shape doesn't apply.
    """
    if axis is None:
        return core

    def wrapped(q, k, v):
        from cenet_tpu.core.mesh import get_attention_mesh

        mesh = get_attention_mesh()
        if mesh is None:
            return core(q, k, v)
        spec = _head_shard_specs(mesh, axis, q.shape[1], q.shape[0])
        if spec is None:
            return core(q, k, v)
        f = jax.shard_map(core, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
        return f(q, k, v)

    return wrapped


@functools.partial(jax.jit, static_argnames=("q_chunk",))
def chunked_attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, q_chunk: int = 512) -> jnp.ndarray:
    """softmax(q @ kᵀ) @ v scanned over query blocks; q pre-scaled.

    q: (B, H, N, D), k: (B, H, M, D), v: (B, H, M, Dv) → (B, H, N, Dv)
    """
    b, h, n, d = q.shape
    dv = v.shape[-1]
    c = min(q_chunk, n)
    pad = (-n) % c
    if pad:
        q = jnp.concatenate([q, jnp.zeros((b, h, pad, d), q.dtype)], axis=2)
    nblk = (n + pad) // c
    qb = q.reshape(b, h, nblk, c, d).transpose(2, 0, 1, 3, 4)  # (nblk, B, H, c, d)

    @jax.checkpoint
    def block(q_blk):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_blk, k)
        w = _softmax_fp32(s)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    def body(_, q_blk):
        return None, block(q_blk)

    _, out = jax.lax.scan(body, None, qb)
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, nblk * c, dv)
    return out[:, :, :n]


def diff_attention_core(q1, k1, q2, k2, v, lam, impl: str = "pallas") -> jnp.ndarray:
    """softmax(q1·k1ᵀ)·V − λ·softmax(q2·k2ᵀ)·V with shared V (q pre-scaled).

    On TPU with ``impl='pallas'`` this is the fused
    :func:`cenet_tpu.ops.pallas_attention.pallas_diff_attention` kernel — one
    (P₁ − λP₂)·V matmul, one combined dV, shared dO·Vᵀ, dλ for free. Elsewhere it
    decomposes into two core calls (identical numerics to the reference's
    A₁V − λA₂V order of operations).
    """
    impl, axis = parse_impl(impl)
    if impl == "ring":
        # Sequence/context parallelism: the '@axis' names the SEQ mesh axis
        # (tokens shard, k/v ride the ICI ring) — not a TP head axis. Each
        # softmax group streams independently; λ combines local outputs.
        from cenet_tpu.ops.ring_attention import make_ring_core

        core = make_ring_core(axis or "seq")
        out1 = core(q1, k1, v)
        out2 = core(q2, k2, v)
        return out1 - lam.astype(out1.dtype) * out2
    if axis is not None:
        from cenet_tpu.core.mesh import get_attention_mesh

        mesh = get_attention_mesh()
        if mesh is not None:
            spec = _head_shard_specs(mesh, axis, q1.shape[1], q1.shape[0])
            if spec is not None:
                f = jax.shard_map(
                    functools.partial(diff_attention_core, impl=impl), mesh=mesh,
                    in_specs=(spec, spec, spec, spec, spec, P()), out_specs=spec,
                )
                return f(q1, k1, q2, k2, v, lam)
    b, h, n, _ = q1.shape
    m = k1.shape[2]
    small = b * h * n * m * 4 <= _SMALL_LIMIT
    if impl == "pallas" and _pallas_routable() and not small:
        try:
            from cenet_tpu.ops.pallas_attention import pallas_diff_attention

            return pallas_diff_attention(q1, k1, q2, k2, v, lam.astype(jnp.float32))
        except Exception:
            pass
    if small or impl == "xla":
        out1 = jnp.einsum("bhnm,bhmd->bhnd", _softmax_fp32(jnp.einsum("bhnd,bhmd->bhnm", q1, k1)), v)
        out2 = jnp.einsum("bhnm,bhmd->bhnd", _softmax_fp32(jnp.einsum("bhnd,bhmd->bhnm", q2, k2)), v)
    else:
        out1 = chunked_attention_core(q1, k1, v)
        out2 = chunked_attention_core(q2, k2, v)
    return out1 - lam.astype(out1.dtype) * out2


def diff_attention_interleaved(q, k, v, lam, impl: str = "pallas") -> jnp.ndarray:
    """Diff attention taking the projections' NATIVE interleaved layout:
    q/k (B, 2h, N, d) with group-1 heads at even rows, shared v (B, h, M, 2d).

    On TPU this feeds :func:`pallas_diff_attention_interleaved` directly — the
    kernel reads head pairs via (2, bq, d) blocks, so no 0::2 slices, q-pads or
    dq scatters exist at the call site (measured −1.5 ms/step at DSEB1, round-3
    PERF_NOTES). Off-TPU it decomposes exactly like :func:`diff_attention_core`.

    An ``'@axis'`` impl suffix (e.g. ``'pallas@model'``) runs the whole router
    head-local inside shard_map over that mesh axis: each device keeps its own
    head PAIRS (q/k sharded on dim 1 in blocks of 2h/m — pairs stay intact when
    h % m == 0), so the fused kernel composes with tensor parallelism without
    GSPMD gathers.
    """
    impl, axis = parse_impl(impl)
    if impl == "ring":
        # seq-parallel routing: decompose to the two softmax groups and stream
        # each around the 'seq' ring (the interleaved-pair Pallas layout only
        # pays off on-chip; under SP the N² map never exists anywhere).
        return diff_attention_core(
            q[:, 0::2], k[:, 0::2], q[:, 1::2], k[:, 1::2], v, lam,
            impl="ring" if axis is None else f"ring@{axis}",
        )
    if axis is not None:
        from cenet_tpu.core.mesh import get_attention_mesh

        mesh = get_attention_mesh()
        if mesh is not None and q.shape[1] % (2 * mesh.shape.get(axis, 1)) == 0:
            spec = _head_shard_specs(mesh, axis, q.shape[1], q.shape[0])
            if spec is not None:
                f = jax.shard_map(
                    functools.partial(diff_attention_interleaved, impl=impl), mesh=mesh,
                    in_specs=(spec, spec, spec, P()), out_specs=spec,
                )
                return f(q, k, v, lam)
    b, h2, n, _ = q.shape
    m = k.shape[2]
    small = (b * h2 // 2) * n * m * 4 <= _SMALL_LIMIT
    if impl == "pallas" and _pallas_routable() and not small:
        try:
            from cenet_tpu.ops.pallas_attention import pallas_diff_attention_interleaved

            return pallas_diff_attention_interleaved(q, k, v, lam.astype(jnp.float32))
        except Exception:
            pass
    return diff_attention_core(q[:, 0::2], k[:, 0::2], q[:, 1::2], k[:, 1::2], v, lam, impl=impl)


def flash_attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas attention on TPU; chunked-XLA fallback elsewhere.

    Small attention sites (full-map fp32 footprint ≤ 32 MB: PVT SRA at all stages —
    KV is spatially reduced to ≤49² there — and Nonlocal below 56 px) skip the
    kernel: the map fits comfortably and XLA's fused naive path beats the pallas
    grid/padding overhead.
    """
    b, h, n, _ = q.shape
    m = k.shape[2]
    if b * h * n * m * 4 <= _SMALL_LIMIT:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        weights = _softmax_fp32(logits)
        return jnp.einsum("bhnm,bhmd->bhnd", weights, v)
    if _pallas_routable():
        try:
            from cenet_tpu.ops.pallas_attention import pallas_attention

            return pallas_attention(q, k, v)
        except Exception:
            pass
    return chunked_attention_core(q, k, v)
