"""Fused Pallas TPU attention kernel.

Shapes in this model are short-sequence / skinny-head (N ≤ 3136, D ∈ {8..64}): the
whole K and V for one (batch, head) fit in VMEM (≤ 0.8 MB each at D padded to 128),
so the kernel streams query blocks and computes each block's *full* softmax row in
one shot — no online max/sum bookkeeping, numerics identical to the reference
softmax — while touching HBM once per operand.

Backward runs the memory-efficient chunked XLA core under ``jax.vjp`` (recompute
strategy); a fully fused backward kernel is a follow-up optimization.

Used via ``attn_impl='pallas'`` (see ``cenet_tpu/nn/attention.py``); validated
against the naive core in tests (interpret mode on CPU, numerically on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, m_valid: int):
    q = q_ref[0]  # (bq, Dp)
    k = k_ref[0]  # (Mp, Dp)
    v = v_ref[0]  # (Mp, DVp)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Mp)
    mp = k.shape[0]
    if m_valid < mp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < m_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pallas_attention_fwd_impl(q, k, v, block_q: int = 256, interpret: bool = False):
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

    out = pl.pallas_call(
        functools.partial(_attn_kernel, m_valid=m),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, dvp), q.dtype),
        grid=(b * h, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dvp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :n, :dv].reshape(b, h, n, dv)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, m_valid: int, block_q: int):
    """Flash backward for one (batch, head): recompute P per q-block; accumulate
    dK/dV in fp32 VMEM scratch; dQ written per block.

    dV = Pᵀ dO; dP = dO Vᵀ; dS = P∘(dP − rowsum(dP∘P)); dQ = dS K; dK = dSᵀ Q.
    """
    k = k_ref[0]  # (Mp, Dp)
    v = v_ref[0]  # (Mp, DVp)
    np_ = q_ref.shape[1]
    mp = k.shape[0]

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    n_blocks = np_ // block_q

    def body(i, _):
        qb = q_ref[0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if m_valid < mp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < m_valid, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)  # (bq, Mp) fp32
        dp_ = jax.lax.dot_general(
            dob, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, Mp)
        d = jnp.sum(dp_ * p, axis=-1, keepdims=True)
        ds = p * (dp_ - d)
        ds_l = ds.astype(qb.dtype)
        p_l = p.astype(qb.dtype)
        dq_ref[0, pl.ds(i * block_q, block_q), :] = jax.lax.dot_general(
            ds_l, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds_l, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_acc[...] += jax.lax.dot_general(
            p_l, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return _

    jax.lax.fori_loop(0, n_blocks, body, None)
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pallas_attention_bwd_impl(q, k, v, g, block_q: int = 128, interpret: bool = False):
    b, h, n, d = q.shape
    m = k.shape[2]
    dv_dim = v.shape[-1]
    dp = _round_up(d, 128)
    dvp = _round_up(dv_dim, 128)
    mp = _round_up(m, 128)
    bq = min(block_q, _round_up(n, 128))
    np_ = _round_up(n, bq)

    qf = jnp.zeros((b * h, np_, dp), q.dtype).at[:, :n, :d].set(q.reshape(b * h, n, d))
    kf = jnp.zeros((b * h, mp, dp), k.dtype).at[:, :m, :d].set(k.reshape(b * h, m, d))
    vf = jnp.zeros((b * h, mp, dvp), v.dtype).at[:, :m, :dv_dim].set(v.reshape(b * h, m, dv_dim))
    gf = jnp.zeros((b * h, np_, dvp), g.dtype).at[:, :n, :dv_dim].set(g.reshape(b * h, n, dv_dim))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, m_valid=m, block_q=bq),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, mp, dp), k.dtype),
            jax.ShapeDtypeStruct((b * h, mp, dvp), v.dtype),
        ),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dvp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dvp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dvp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((mp, dp), jnp.float32),
            pltpu.VMEM((mp, dvp), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf)
    dq = dq[:, :n, :d].reshape(b, h, n, d)
    dk = dk[:, :m, :d].reshape(b, h, m, d)
    dv = dv[:, :m, :dv_dim].reshape(b, h, m, dv_dim)
    return dq, dk, dv


@jax.custom_vjp
def pallas_attention(q, k, v):
    """softmax(q @ kᵀ) @ v (q pre-scaled), fused on TPU. (B,H,N,D)×(B,H,M,D)×(B,H,M,DV)."""
    return _pallas_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _pallas_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    return _pallas_attention_bwd_impl(q, k, v, g)


pallas_attention.defvjp(_fwd, _bwd)
