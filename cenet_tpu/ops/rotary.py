"""Rotary position embedding (TPU Pallas + XLA fallback).

Capability parity with the reference's vendored Triton rotary kernel
(``modules/kernel/rotary.py``) which is *dead code* there (import commented out at
``multihead_diffattn.py:6``); we keep it equally unplugged by default
(``MultiheadDiffAttn.use_rotary=False``) but functional and tested.

``interleaved=True`` (GPT-J style): pairs (x₀,x₁),(x₂,x₃)… are rotated.
``interleaved=False`` (GPT-NeoX style): the two half-blocks are rotated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_rotary_tables(seq_len: int, rotary_dim: int, base: float = 10000.0):
    """cos/sin tables of shape (seq_len, rotary_dim // 2), fp32."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, interleaved: bool = True) -> jnp.ndarray:
    """x: (B, H, N, D); cos/sin: (N, rd/2) with rd ≤ D. Rotates the first rd dims."""
    rd = 2 * cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    c = cos.astype(x.dtype)[None, None, :, :]
    s = sin.astype(x.dtype)[None, None, :, :]
    if interleaved:
        x0 = xr[..., 0::2]
        x1 = xr[..., 1::2]
        o0 = x0 * c - x1 * s
        o1 = x1 * c + x0 * s
        out = jnp.stack([o0, o1], axis=-1).reshape(xr.shape)
    else:
        half = rd // 2
        x0, x1 = xr[..., :half], xr[..., half:]
        out = jnp.concatenate([x0 * c - x1 * s, x1 * c + x0 * s], axis=-1)
    return jnp.concatenate([out, xp], axis=-1) if xp.shape[-1] else out


def _rotary_kernel(x_ref, cos_ref, sin_ref, o_ref):
    """Fused non-interleaved rotary on (rows, D) blocks; cos/sin pre-broadcast."""
    x = x_ref[:]
    c = cos_ref[:]
    s = sin_ref[:]
    d = x.shape[-1]
    half = d // 2
    x0 = x[..., :half]
    x1 = x[..., half:]
    o_ref[..., :half] = x0 * c - x1 * s
    o_ref[..., half:] = x1 * c + x0 * s


def apply_rotary_emb_pallas(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Pallas non-interleaved rotary for (B, H, N, D) with rd == D.

    On CPU/GPU backends falls back to the XLA path.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        return apply_rotary_emb(x, cos, sin, interleaved=False)
    b, h, n, d = x.shape
    assert cos.shape == (n, d // 2)
    x2 = x.reshape(b * h, n, d)
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    out = pl.pallas_call(
        _rotary_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), x.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(x2, c, s)
    return out.reshape(b, h, n, d)
