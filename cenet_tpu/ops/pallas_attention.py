"""Fused Pallas TPU attention kernels (forward + flash backward).

Shapes in this model are short-sequence / skinny-head (N ≤ 3136, D ∈ {8..64}): the
whole K and V for one (batch, head) fit in VMEM (≤ 0.8 MB each at D padded to 128),
so the forward streams query blocks and computes each block's *full* softmax row in
one shot — no online max/sum bookkeeping, numerics identical to the reference
softmax — while touching HBM once per operand. The forward also emits the row
logsumexp L, so the backward never re-normalizes.

Backward is the standard flash decomposition into two kernels sized to VMEM:
  * dq kernel, grid (B·H, N/bq):  P = exp(S − L); dP = dO·Vᵀ; dS = P∘(dP − Δ);
    dq = dS·K, with Δ = rowsum(dO ∘ O) computed outside (cheap XLA elementwise).
  * dkv kernel, grid (B·H, M/bk): dK_blk = dSᵀ_blk·Q, dV_blk = Pᵀ_blk·dO with the
    full Q/dO streams resident in VMEM per (b,h).

Used via ``attn_impl='pallas'`` (see ``cenet_tpu/nn/attention.py``); validated
against the naive core in tests (interpret mode on CPU, numerically on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _masked_logits(s, m_valid):
    mp = s.shape[-1]
    if m_valid < mp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        s = jnp.where(col < m_valid, s, _NEG_INF)
    return s


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, m_valid: int):
    q = q_ref[0]  # (bq, Dp)
    k = k_ref[0]  # (Mp, Dp)
    v = v_ref[0]  # (Mp, DVp)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _masked_logits(s, m_valid)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # deferred normalization: divide the (bq, DVp) output instead of the (bq, Mp)
    # probability matrix — one fewer full-width VPU pass
    o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)
    # logsumexp per row, broadcast over an 8-lane minor dim (Mosaic tile alignment)
    l_ref[0] = jnp.broadcast_to(m + jnp.log(denom), (q.shape[0], 8))


def _pallas_attention_fwd_impl(q, k, v, block_q: int = 256, interpret: bool = False, with_lse: bool = False):
    b, h, n, d = q.shape
    m = k.shape[2]
    dv = v.shape[-1]
    dp = _round_up(d, 128)
    dvp = _round_up(dv, 128)
    mp = _round_up(m, 128)
    bq = min(block_q, _round_up(n, 128))
    np_ = _round_up(n, bq)

    qf = jnp.zeros((b * h, np_, dp), q.dtype).at[:, :n, :d].set(q.reshape(b * h, n, d))
    kf = jnp.zeros((b * h, mp, dp), k.dtype).at[:, :m, :d].set(k.reshape(b * h, m, d))
    vf = jnp.zeros((b * h, mp, dvp), v.dtype).at[:, :m, :dv].set(v.reshape(b * h, m, dv))

    out, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, m_valid=m),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_, dvp), q.dtype),
            jax.ShapeDtypeStruct((b * h, np_, 8), jnp.float32),
        ),
        grid=(b * h, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dvp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    o = out[:, :n, :dv].reshape(b, h, n, dv)
    if with_lse:
        return o, lse[:, :n, 0].reshape(b, h, n)
    return o


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _attn_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, dq_ref, *, m_valid: int):
    q = q_ref[0]  # (bq, Dp)
    k = k_ref[0]  # (Mp, Dp)
    v = v_ref[0]  # (Mp, DVp)
    do = do_ref[0]  # (bq, DVp)
    lse = l_ref[0][:, 0:1]  # (bq, 1)
    delta = delta_ref[0][:, 0:1]  # (bq, 1)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _masked_logits(s, m_valid)
    p = jnp.exp(s - lse)
    dp_ = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp_ - delta)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _attn_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, dq_ref, dk_ref, dv_ref, *, n_valid: int):
    """Combined backward: one S recompute per KV block yields dk/dv blocks AND a dq
    partial, accumulated into the revisited dq output block (same block index across
    the KV-loop, so it stays VMEM-resident)."""
    q = q_ref[0]  # (Np, Dp)
    kb = k_ref[0]  # (bk, Dp)
    vb = v_ref[0]  # (bk, DVp)
    do = do_ref[0]  # (Np, DVp)
    lse = l_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    np_ = s.shape[0]
    if n_valid < np_:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(row < n_valid, jnp.exp(s - lse), 0.0)
    else:
        p = jnp.exp(s - lse)
    dp_ = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp_ - delta)
    ds_l = ds.astype(q.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds_l, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dq_part = jax.lax.dot_general(
        ds_l, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[0] = dq_part.astype(dq_ref.dtype)

    @pl.when(pl.program_id(1) > 0)
    def _():
        dq_ref[0] += dq_part.astype(dq_ref.dtype)


def _attn_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, dk_ref, dv_ref, *, n_valid: int):
    q = q_ref[0]  # (Np, Dp)
    kb = k_ref[0]  # (bk, Dp)
    vb = v_ref[0]  # (bk, DVp)
    do = do_ref[0]  # (Np, DVp)
    lse = l_ref[0][:, 0:1]  # (Np, 1)
    delta = delta_ref[0][:, 0:1]
    # (Np, bk) logits of the full query stream against this K block
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # padded query rows carry lse=0 ⇒ exp(s) would be garbage; zero them explicitly
    np_ = s.shape[0]
    if n_valid < np_:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(row < n_valid, jnp.exp(s - lse), 0.0)
    else:
        p = jnp.exp(s - lse)
    dp_ = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # (Np, bk)
    ds = p * (dp_ - delta)
    dk = jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pallas_attention_bwd_fused_impl(q, k, v, o, lse, g, block_k: int = 128, interpret: bool = False):
    """Single-kernel backward (dq accumulated fp32 in a revisited output block)."""
    b, h, n, d = q.shape
    m = k.shape[2]
    dv_dim = v.shape[-1]
    dp = _round_up(d, 128)
    dvp = _round_up(dv_dim, 128)
    np_ = _round_up(n, 128)
    bk = min(block_k, _round_up(m, 128))
    mp = _round_up(_round_up(m, 128), bk)

    bh = b * h
    qf = jnp.zeros((bh, np_, dp), q.dtype).at[:, :n, :d].set(q.reshape(bh, n, d))
    kf = jnp.zeros((bh, mp, dp), k.dtype).at[:, :m, :d].set(k.reshape(bh, m, d))
    vf = jnp.zeros((bh, mp, dvp), v.dtype).at[:, :m, :dv_dim].set(v.reshape(bh, m, dv_dim))
    gf = jnp.zeros((bh, np_, dvp), g.dtype).at[:, :n, :dv_dim].set(g.reshape(bh, n, dv_dim))
    lf = jnp.zeros((bh, np_, 8), jnp.float32).at[:, :n, :].set(lse.reshape(bh, n, 1))
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1).reshape(bh, n, 1)
    df = jnp.zeros((bh, np_, 8), jnp.float32).at[:, :n, :].set(delta)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_fused_kernel, n_valid=n),
        out_shape=(
            jax.ShapeDtypeStruct((bh, np_, dp), jnp.float32),  # fp32 accumulator
            jax.ShapeDtypeStruct((bh, mp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, mp, dvp), v.dtype),
        ),
        grid=(bh, mp // bk),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dvp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 8), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 8), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, np_, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lf, df)
    dq = dq[:, :n, :d].reshape(b, h, n, d).astype(q.dtype)
    dk = dk[:, :m, :d].reshape(b, h, m, d)
    dv = dv[:, :m, :dv_dim].reshape(b, h, m, dv_dim)
    return dq, dk, dv


def _pallas_attention_bwd_impl(q, k, v, o, lse, g, block_q: int = 256, block_k: int = 256, interpret: bool = False):
    b, h, n, d = q.shape
    m = k.shape[2]
    dv_dim = v.shape[-1]
    dp = _round_up(d, 128)
    dvp = _round_up(dv_dim, 128)
    bq = min(block_q, _round_up(n, 128))
    np_ = _round_up(n, bq)
    bk = min(block_k, _round_up(m, 128))
    mp = _round_up(_round_up(m, 128), bk)

    bh = b * h
    qf = jnp.zeros((bh, np_, dp), q.dtype).at[:, :n, :d].set(q.reshape(bh, n, d))
    kf = jnp.zeros((bh, mp, dp), k.dtype).at[:, :m, :d].set(k.reshape(bh, m, d))
    vf = jnp.zeros((bh, mp, dvp), v.dtype).at[:, :m, :dv_dim].set(v.reshape(bh, m, dv_dim))
    gf = jnp.zeros((bh, np_, dvp), g.dtype).at[:, :n, :dv_dim].set(g.reshape(bh, n, dv_dim))
    lf = jnp.zeros((bh, np_, 8), jnp.float32).at[:, :n, :].set(lse.reshape(bh, n, 1))
    # Δ = rowsum(dO ∘ O) — the flash-backward substitution for rowsum(dP ∘ P)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1).reshape(bh, n, 1)
    df = jnp.zeros((bh, np_, 8), jnp.float32).at[:, :n, :].set(delta)

    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, m_valid=m),
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
        grid=(bh, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dvp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, gf, lf, df)

    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkv_kernel, n_valid=n),
        out_shape=(
            jax.ShapeDtypeStruct((bh, mp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, mp, dvp), v.dtype),
        ),
        grid=(bh, mp // bk),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dvp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 8), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 8), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lf, df)

    dq = dq[:, :n, :d].reshape(b, h, n, d)
    dk = dk[:, :m, :d].reshape(b, h, m, d)
    dv = dv[:, :m, :dv_dim].reshape(b, h, m, dv_dim)
    return dq, dk, dv


@jax.custom_vjp
def pallas_attention(q, k, v):
    """softmax(q @ kᵀ) @ v (q pre-scaled), fused on TPU. (B,H,N,D)×(B,H,M,D)×(B,H,M,DV)."""
    return _pallas_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    o, lse = _pallas_attention_fwd_impl(q, k, v, with_lse=True)
    return o, (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    # Two-kernel split (dq + dkv) measured faster than the single fused kernel
    # (10.9 vs 14.9 ms at DSEB1 shapes): the fused variant forces bk=128 to fit
    # VMEM, halving matmul efficiency.
    return _pallas_attention_bwd_impl(q, k, v, o, lse, g)


pallas_attention.defvjp(_fwd, _bwd)
