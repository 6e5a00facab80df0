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

import jax
import jax.numpy as jnp


def _softmax_fp32(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    y = jax.nn.softmax(x.astype(jnp.float32), axis=axis)
    return y.astype(x.dtype)


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
    b, h, n, _ = q1.shape
    m = k1.shape[2]
    small = b * h * n * m * 4 <= 32 * 1024 * 1024
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if impl == "pallas" and on_tpu and not small:
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
    """
    b, h2, n, _ = q.shape
    m = k.shape[2]
    small = (b * h2 // 2) * n * m * 4 <= 32 * 1024 * 1024
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if impl == "pallas" and on_tpu and not small:
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
    if b * h * n * m * 4 <= 32 * 1024 * 1024:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        weights = _softmax_fp32(logits)
        return jnp.einsum("bhnm,bhmd->bhnd", weights, v)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu:
        try:
            from cenet_tpu.ops.pallas_attention import pallas_attention

            return pallas_attention(q, k, v)
        except Exception:
            pass
    return chunked_attention_core(q, k, v)
