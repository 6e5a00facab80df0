"""Attention modules: PVT spatial-reduction attention, differential attention, non-local.

All cores route through a pluggable ``attention_core`` so the XLA reference path and the
fused Pallas kernel (``cenet_tpu/ops``) are interchangeable and cross-validated.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.layers import (
    BatchNorm,
    Conv2d,
    Dense,
    Dropout,
    LayerNorm,
    RMSNorm,
    normal_init,
    trunc_normal_init,
)


def xla_attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain attention: softmax(q @ kᵀ) @ v with fp32 softmax; q pre-scaled.

    q: (B, H, N, D), k: (B, H, M, D), v: (B, H, M, Dv) → (B, H, N, Dv).
    """
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    weights = F.softmax_fp32(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v)


def get_attention_core(impl: str = "xla") -> Callable:
    """'xla': naive full-matrix (reference numerics, O(N²) memory);
    'chunked': query-block scan, identical numerics, O(N·chunk) memory;
    'pallas': fused TPU kernel (chunked fallback off-TPU).

    An ``'@axis'`` suffix (e.g. ``'pallas@model'``) wraps the core in shard_map
    over that mesh axis so it runs head-local under tensor parallelism
    (ops/flash_attention.shard_heads; no-op without a registered mesh or when
    the head count doesn't divide)."""
    from cenet_tpu.ops.flash_attention import parse_impl, shard_heads

    impl, axis = parse_impl(impl)
    if impl == "xla":
        return shard_heads(xla_attention_core, axis)
    if impl == "chunked":
        from cenet_tpu.ops.flash_attention import chunked_attention_core

        return shard_heads(chunked_attention_core, axis)
    if impl == "pallas":
        from cenet_tpu.ops.flash_attention import flash_attention_core

        return shard_heads(flash_attention_core, axis)
    if impl == "ring":
        # sequence/context parallelism: tokens sharded over a 'seq' mesh axis,
        # k/v rotated via ppermute (ops/ring_attention.py; the >224² hook of
        # SURVEY §2.7). '@axis' names the mesh axis (default 'seq').
        from cenet_tpu.ops.ring_attention import make_ring_core

        return make_ring_core(axis or "seq")
    raise ValueError(f"unknown attention impl: {impl}")


class SRAAttention(nn.Module):
    """PVTv2 spatial-reduction attention (reference ``pvtv2.py:50-109``).

    Tokens (B, N, C) with known (H, W); when ``sr_ratio > 1`` the KV stream is
    downsampled by a strided conv + LayerNorm before projection.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    sr_ratio: int = 1
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = self.qk_scale or hd**-0.5

        q = Dense(C, C, use_bias=self.qkv_bias, weight_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros, name="q")(x)
        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        if self.sr_ratio > 1:
            x_ = x.reshape(B, H, W, C)
            x_ = Conv2d(
                C, C, self.sr_ratio, stride=self.sr_ratio, padding=0,
                weight_init=self._conv_init(), name="sr",
            )(x_)
            x_ = x_.reshape(B, -1, C)
            x_ = LayerNorm(C, eps=1e-5, name="norm")(x_)
        else:
            x_ = x
        kv = Dense(C, C * 2, use_bias=self.qkv_bias, weight_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros, name="kv")(x_)
        M = x_.shape[1]
        kv = kv.reshape(B, M, 2, h, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        if self.attn_drop > 0.0 and not deterministic:
            # Post-softmax dropout on the attention weights (reference
            # pvtv2.py:88-90: Dropout(attn_drop) between softmax and @v).
            # Only the naive core materializes the weight matrix; the fused
            # chunked/pallas cores cannot apply it — and every reference
            # config (b0–b5) uses attn_drop=0.0, so this is an opt-in
            # train-mode capability, not a default path.
            if self.attn_impl != "xla":
                # plain 'xla' ONLY (ADVICE r4): an 'xla@model' impl would fall
                # through to this dense path OUTSIDE shard_heads, silently
                # dropping the TP head-local layout intent.
                raise NotImplementedError(
                    f"attn_drop={self.attn_drop} > 0 requires attn_impl='xla' "
                    "(the chunked/pallas cores never materialize attention "
                    "weights, and the dense dropout path bypasses the TP "
                    "shard_map); all reference configs use attn_drop=0.0"
                )
            logits = jnp.einsum("bhnd,bhmd->bhnm", q * jnp.asarray(scale, q.dtype), k)
            weights = F.softmax_fp32(logits, axis=-1)
            weights = Dropout(self.attn_drop)(weights, deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
        else:
            core = get_attention_core(self.attn_impl)
            out = core(q * jnp.asarray(scale, q.dtype), k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = Dense(C, C, use_bias=True, weight_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros, name="proj")(out)
        out = Dropout(self.proj_drop)(out, deterministic)
        return out

    @staticmethod
    def _conv_init():
        from cenet_tpu.nn.layers import fan_out_conv_init

        return fan_out_conv_init


def lambda_init_fn(depth: int) -> float:
    """Reference ``multihead_diffattn.py:28-29``."""
    return 0.8 - 0.6 * math.exp(-0.3 * depth)


class MultiheadDiffAttn(nn.Module):
    """DIFF-Transformer attention (reference ``multihead_diffattn.py:32-129``).

    Non-causal (the reference's causal mask and rotary embedding are commented out);
    heads split into two groups whose softmax maps are combined as A₁ − λ·A₂ with the
    reparameterized λ, followed by an affine-free RMSNorm and ×(1 − λ_init).
    Optional GQA via ``num_kv_heads`` (reference ``repeat_kv``, ``:17-26``).
    Optional rotary embedding is capability parity with the reference's dead Triton
    kernel (``modules/kernel/rotary.py``) — off by default, like the reference.
    """

    embed_dim: int
    depth: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    attn_impl: str = "xla"
    use_rotary: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, rel_pos=None) -> jnp.ndarray:
        B, N, E = x.shape
        h = self.num_heads
        h_kv = self.num_kv_heads or h
        n_rep = h // h_kv
        hd = E // h // 2
        scaling = hd**-0.5
        lambda_init = lambda_init_fn(self.depth)

        q = Dense(E, E, use_bias=False, name="q_proj")(x)
        k = Dense(E, E // n_rep, use_bias=False, name="k_proj")(x)
        v = Dense(E, E // n_rep, use_bias=False, name="v_proj")(x)

        q = q.reshape(B, N, 2 * h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, 2 * h_kv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h_kv, 2 * hd).transpose(0, 2, 1, 3)

        if self.use_rotary and rel_pos is not None:
            from cenet_tpu.ops.rotary import apply_rotary_emb

            cos, sin = rel_pos
            q = apply_rotary_emb(q, cos, sin, interleaved=True)
            k = apply_rotary_emb(k, cos, sin, interleaved=True)

        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=1)
            v = jnp.repeat(v, n_rep, axis=1)

        lam_shape = (hd,)
        lam_init = normal_init(0.1)
        lambda_q1 = self.param("lambda_q1", lam_init, lam_shape, jnp.float32)
        lambda_k1 = self.param("lambda_k1", lam_init, lam_shape, jnp.float32)
        lambda_q2 = self.param("lambda_q2", lam_init, lam_shape, jnp.float32)
        lambda_k2 = self.param("lambda_k2", lam_init, lam_shape, jnp.float32)
        lambda_1 = jnp.exp(jnp.sum(lambda_q1 * lambda_k1))
        lambda_2 = jnp.exp(jnp.sum(lambda_q2 * lambda_k2))
        lambda_full = (lambda_1 - lambda_2 + lambda_init).astype(x.dtype)

        qs = q * jnp.asarray(scaling, q.dtype)
        from cenet_tpu.ops.flash_attention import parse_impl

        if parse_impl(self.attn_impl)[0] == "xla" or (rel_pos is not None and not self.use_rotary):
            # Naive reference path: full (B, 2h, N, N) maps, exact reference order
            # of ops incl. the (no-op on finite inputs) nan_to_num
            # (multihead_diffattn.py:105-121). O(N²) memory — use for parity only.
            logits = jnp.einsum("bhnd,bhmd->bhnm", qs, k)
            logits = jnp.nan_to_num(logits)
            weights = F.softmax_fp32(logits, axis=-1)
            weights = weights.reshape(B, h, 2, N, N)
            weights = weights[:, :, 0] - lambda_full * weights[:, :, 1]
            if rel_pos is not None and not self.use_rotary:
                weights = weights + rel_pos
            attn = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
        else:
            # Memory-efficient path: (A₁ − λ·A₂)·V with the two softmax groups
            # (even/odd interleaved heads after the (B,2h,..)→(B,h,2,..) reshape)
            # routed through the fused diff-attention core — on TPU ONE Pallas
            # kernel exploiting the shared V (single (P₁−λP₂)·V matmul, combined
            # dV, dλ for free); off-TPU two chunked-scan calls. The N×N map is
            # never materialized; softmax numerics identical (fp32, full rows).
            # (Merging by duplicating V instead was measured SLOWER in round 1 —
            # it doubles the dV backward work; the shared-V kernel halves it.)
            from cenet_tpu.ops.flash_attention import diff_attention_interleaved

            attn = diff_attention_interleaved(
                qs, k, v, lambda_full.astype(jnp.float32), impl=self.attn_impl,
            )

        attn = RMSNorm(2 * hd, eps=1e-5, affine=False, name="subln")(attn)
        attn = attn * (1 - lambda_init)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, N, h * 2 * hd)
        return Dense(E, E, use_bias=False, name="out_proj")(attn)


class MultiheadDiffAttnCross(nn.Module):
    """Cross-attention differential attention (reference ``multihead_diffattn.py:131-367``).

    Unused by the reference models (kept for component parity). ``variant``:
    * "v1": query from the decoder; output reshaped to NHWC and residually added to
      the (NHWC) source when spatial dims are given (reference V1, ``:244-246``).
    * "v2": query from the encoder; no residual add (reference V2, ``:362-364``).
    """

    embed_dim: int
    depth: int
    num_heads: int
    variant: str = "v1"
    spatial: Optional[int] = None  # H (= W) when inputs are NHWC maps
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, q_src: jnp.ndarray) -> jnp.ndarray:
        from cenet_tpu.nn.dseb import tokenize_torch_view, untokenize_torch_view

        spatial_mode = self.spatial is not None and x.ndim == 4
        x_res = x if self.variant == "v1" else q_src
        if spatial_mode:
            h, w = x.shape[1], x.shape[2]
            x_tok = tokenize_torch_view(x)
            q_tok = tokenize_torch_view(q_src)
        else:
            x_tok, q_tok = x, q_src

        B, N, E = x_tok.shape
        hn = self.num_heads
        hd = E // hn // 2
        scaling = hd**-0.5
        lambda_init = lambda_init_fn(self.depth)

        q = Dense(E, E, use_bias=False, name="q_proj")(q_tok)
        k = Dense(E, E, use_bias=False, name="k_proj")(x_tok)
        v = Dense(E, E, use_bias=False, name="v_proj")(x_tok)
        q = q.reshape(B, N, 2 * hn, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, 2 * hn, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, hn, 2 * hd).transpose(0, 2, 1, 3)

        lam_init = normal_init(0.1)
        l_q1 = self.param("lambda_q1", lam_init, (hd,), jnp.float32)
        l_k1 = self.param("lambda_k1", lam_init, (hd,), jnp.float32)
        l_q2 = self.param("lambda_q2", lam_init, (hd,), jnp.float32)
        l_k2 = self.param("lambda_k2", lam_init, (hd,), jnp.float32)
        lambda_full = (jnp.exp(jnp.sum(l_q1 * l_k1)) - jnp.exp(jnp.sum(l_q2 * l_k2)) + lambda_init).astype(x_tok.dtype)

        from cenet_tpu.ops.flash_attention import parse_impl

        core_impl, tp_axis = parse_impl(self.attn_impl)
        if core_impl == "xla":  # no naive-path need here; chunked is bit-identical
            core_impl = "chunked"
        core = get_attention_core(core_impl if tp_axis is None else f"{core_impl}@{tp_axis}")
        qs = q * jnp.asarray(scaling, q.dtype)
        attn = core(qs[:, 0::2], k[:, 0::2], v) - lambda_full * core(qs[:, 1::2], k[:, 1::2], v)
        attn = RMSNorm(2 * hd, eps=1e-5, affine=False, name="subln")(attn)
        attn = attn * (1 - lambda_init)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, N, E)
        attn = Dense(E, E, use_bias=False, name="out_proj")(attn)

        if spatial_mode:
            attn = untokenize_torch_view(attn, h, w)
            if self.variant == "v1":
                attn = attn + x_res
        return attn


class Nonlocal(nn.Module):
    """Non-local denoising block (reference ``modules/nlb.py:8-148``).

    θ/φ/g 1×1 convs; HW×HW affinity softmax-normalized with C^-0.5 scale; output
    conv + BN; learnable scalar blend z = (1−w)·x + w·p.
    """

    dim_inner: int
    instantiation: str = "softmax"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        theta = Conv2d(C, C, 1, name="conv_theta")(x).reshape(B, H * W, C)
        phi = Conv2d(C, C, 1, name="conv_phi")(x).reshape(B, H * W, C)
        g = Conv2d(C, C, 1, name="conv_g")(x).reshape(B, H * W, C)

        if self.instantiation == "softmax":
            scale = C**-0.5
            core = get_attention_core(self.attn_impl)
            out = core(
                theta[:, None] * jnp.asarray(scale, theta.dtype), phi[:, None], g[:, None]
            )[:, 0]
        elif self.instantiation == "dot_product":
            aff = jnp.einsum("bnc,bmc->bnm", theta, phi) / (H * W)
            out = jnp.einsum("bnm,bmc->bnc", aff, g)
        else:
            raise NotImplementedError(self.instantiation)

        p = out.reshape(B, H, W, C)
        p = Conv2d(C, C, 1, name="conv_out")(p)
        p = BatchNorm(C, eps=1e-5, name="bn")(p, train)
        w = self.param("w", lambda key, shape: jnp.full(shape, 0.5, jnp.float32), ())
        w = w.astype(x.dtype)
        return (1 - w) * x + w * p


class WeightedNonLocalBlock(nn.Module):
    """Weighted non-local variant (reference ``modules/nlb.py:151-191``, unused by
    the models; kept for component parity): softmax affinity between down-projected
    θ/φ, value path g, output conv, learnable scalar blend."""

    in_channels: int
    inter_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ic = self.inter_channels
        theta = Conv2d(C, ic, 1, name="theta")(x).reshape(B, H * W, ic)
        phi = Conv2d(C, ic, 1, name="phi")(x).reshape(B, H * W, ic)
        g = Conv2d(C, ic, 1, name="g")(x).reshape(B, H * W, ic)
        aff = F.softmax_fp32(jnp.einsum("bnc,bmc->bnm", theta, phi) * (ic**-0.5), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", aff, g).reshape(B, H, W, ic)
        y = Conv2d(ic, C, 1, name="out")(y)
        y = BatchNorm(C, name="bn")(y, train)
        w = self.param("w", lambda key, shape: jnp.full(shape, 0.5, jnp.float32), ())
        return (1 - w.astype(x.dtype)) * x + w.astype(x.dtype) * y
