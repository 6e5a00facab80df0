"""CFAM decoder stack: CCU, SRM, MultiOrderDWConv, MCA, CFAModule.

One parameterized implementation covers both reference variants:

* cenet (``networks/cenet/modules/cfam.py``): per-level ``mca_rates``, LeakyReLU in
  the image-pool branch;
* cenet_org (``networks/cenet_org/modules/cfam.py``): fixed rates [6,12,18], ReLU
  pool branch, optional fp32-forced gating.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.attention import Nonlocal
from cenet_tpu.nn.blocks import SepConvBN
from cenet_tpu.nn.layers import BatchNorm, Conv2d, Dropout, DropPath, GroupNorm, LayerNorm, get_act


def build_norm(norm_type: str, dim: int, name: str):
    """Norm factory (reference ``cfam.py:22-32``). BN/SyncBN collapse to BatchNorm:
    under pjit the batch reduction is already global across data-parallel replicas."""
    if norm_type == "GN":
        return GroupNorm(dim, dim, eps=1e-5, name=name)
    if norm_type == "LN2d":
        return LayerNorm(dim, eps=1e-6, name=name)
    return BatchNorm(dim, eps=1e-5, name=name)


class SRM(nn.Module):
    """Spatial recalibration: max/mean/std maps → pwc+dwc → GELU → BN → sigmoid gate
    (reference ``cfam.py:86-101``). Channel std is unbiased (torch ``x.std(1)``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        x_max = jnp.max(xf, axis=-1, keepdims=True)
        x_mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(xf - x_mean), axis=-1, keepdims=True) / max(c - 1, 1)
        x_std = jnp.sqrt(var)
        u = jnp.concatenate([x_max, x_mean, x_std], axis=-1).astype(x.dtype)
        f = Conv2d(3, 1, 1, use_bias=False, name="pwc")(u) + Conv2d(3, 1, 3, padding=1, use_bias=False, name="dwc")(u)
        f = F.gelu(f)
        f = BatchNorm(1, name="bn")(f, train)
        return x * jax.nn.sigmoid(f)


class CAggMlp(nn.Module):
    """Channel-aggregation FFN with SRM gate (reference ``cfam.py:104-159``)."""

    embed_dims: int
    feedforward_channels: int
    kernel_size: int = 3
    act_type: str = "gelu"
    ffn_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        fc = self.feedforward_channels
        x = Conv2d(self.embed_dims, fc, 1, name="fc1")(x)
        x = Conv2d(fc, fc, self.kernel_size, padding=self.kernel_size // 2, groups=fc, name="dwconv")(x)
        x = get_act(self.act_type)(x)
        x = Dropout(self.ffn_drop)(x, deterministic)
        x = SRM(name="srm")(x, train)
        x = Conv2d(fc, self.embed_dims, 1, name="fc2")(x)
        x = Dropout(self.ffn_drop)(x, deterministic)
        return x


def _channel_indices(embed_dims: int, channel_split: Sequence[int]):
    """Reference split logic (``cfam.py:178-190``): cumulative int truncation."""
    total = sum(channel_split)
    ratios = [s / total for s in channel_split]
    indices = [(0, int(ratios[0] * embed_dims))]
    for r in ratios[1:]:
        n = int(r * embed_dims)
        assert n > 0, "channel split ratio is not correct"
        indices.append((indices[-1][1], indices[-1][1] + n))
    return indices


class MultiOrderDWConv(nn.Module):
    """Dilated multi-branch DWConv + image pooling (reference ``cfam.py:162-241``).

    Channel split is hard-coded [5,5,5,1]/16 (the constructor arg is ignored in the
    reference, ``cfam.py:178``); three dilated SepConvBN branches + a 7×7 image-pool
    branch (1×1 conv → BN → act → ×7 bilinear align-corners up, resized back on
    mismatch), concat → 1×1 PW conv.
    """

    embed_dims: int
    rates: Sequence[int] = (6, 12, 18)
    pool_act: str = "leakyrelu_001"  # cenet: LeakyReLU(0.01); cenet_org: relu

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        H, W = x.shape[1], x.shape[2]
        indices = _channel_indices(self.embed_dims, (5, 5, 5, 1))
        outs = []
        for i, (rate, (lo, hi)) in enumerate(zip(self.rates, indices[:3])):
            y = SepConvBN(
                hi - lo, hi - lo, 3, stride=1, rate=rate, depth_activation=True, epsilon=1e-5,
                name=f"dlp{i}",
            )(x[..., lo:hi], train)
            outs.append(y)
        lo, hi = indices[3]
        ipd = hi - lo
        p = F.adaptive_avg_pool2d(x[..., lo:hi], (7, 7))
        p = Conv2d(ipd, ipd, 1, use_bias=False, name="pool_conv")(p)
        p = BatchNorm(ipd, eps=1e-5, name="pool_bn")(p, train)
        if self.pool_act == "leakyrelu_001":
            p = F.leaky_relu(p, 0.01)
        else:
            p = get_act(self.pool_act)(p)
        p = F.resize_bilinear_by_scale(p, 7.0, align_corners=True)
        if p.shape[1] != H or p.shape[2] != W:
            p = F.resize_bilinear(p, (H, W), align_corners=False)
        outs.append(p)
        y = jnp.concatenate(outs, axis=-1)
        return Conv2d(self.embed_dims, self.embed_dims, 1, name="PW_conv")(y)


class CCU(nn.Module):
    """Style-based channel recalibration (reference ``cfam.py:244-264``).

    Per-channel (max, mean, biased-std) stats → grouped Conv1d(k=3) → ReLU →
    grouped Conv1d(k=1) → BatchNorm1d (skipped when batch==1) → sigmoid gate.
    Weights stored in torch Conv1d layout for converter fidelity.
    """

    channel: int
    hidden_scale: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        hs = self.hidden_scale
        xf = x.astype(jnp.float32)
        x_max = jnp.max(xf, axis=(1, 2))
        x_mean = jnp.mean(xf, axis=(1, 2))
        x_std = jnp.sqrt(jnp.mean(jnp.square(xf - x_mean[:, None, None, :]), axis=(1, 2)))
        u = jnp.stack([x_max, x_mean, x_std], axis=-1).astype(x.dtype)  # (B, C, 3)

        w1 = self.param("fc1_weight", _conv1d_init(hs * c, 1, 3), (hs * c, 1, 3), jnp.float32)
        w2 = self.param("fc2_weight", _conv1d_init(c, hs, 1), (c, hs, 1), jnp.float32)
        # grouped Conv1d(k=3, groups=C): z1[b, c, j] = Σ_t w1[c*hs+j, 0, t] · u[b, c, t]
        w1r = w1.reshape(c, hs, 3).astype(x.dtype)
        z1 = jnp.einsum("bct,cjt->bcj", u, w1r)
        z1 = F.relu(z1)
        # grouped Conv1d(k=1, groups=C): z[b, c] = Σ_j w2[c, j, 0] · z1[b, c, j]
        w2r = w2[..., 0].astype(x.dtype)
        z = jnp.einsum("bcj,cj->bc", z1, w2r)
        # Reference skips BatchNorm1d when batch==1 (cfam.py:260-261). The variables
        # must exist regardless of the tracing batch size, so always instantiate the
        # module and select the un-normalized path for b==1 (stats untouched).
        z_bn = BatchNorm(c, name="bn")(z, train=(train and b > 1))
        if b > 1:
            z = z_bn
        g = jax.nn.sigmoid(z.astype(jnp.float32)).astype(x.dtype)
        return x * g[:, None, None, :]


def _conv1d_init(out_ch: int, in_per_group: int, k: int):
    """torch Conv1d default init for grouped weights (fan_in = in_per_group * k)."""
    import math as _m

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / _m.sqrt(in_per_group * k)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MCA(nn.Module):
    """Multi-scale contextual aggregation (reference ``cfam.py:267-306``):

    CCU recalibration → SiLU(gate)·SiLU(MultiOrderDWConv value) → 1×1 proj →
    residual → Nonlocal denoising.
    """

    embed_dims: int
    rates: Sequence[int] = (2, 3, 4)
    attn_act_type: str = "silu"
    attn_force_fp32: bool = False
    pool_act: str = "leakyrelu_001"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        x = CCU(self.embed_dims, name="ccu")(x, train)
        g = Conv2d(self.embed_dims, self.embed_dims, 1, name="gate")(x)
        v = MultiOrderDWConv(self.embed_dims, self.rates, pool_act=self.pool_act, name="value")(x, train)
        act = get_act(self.attn_act_type)
        if self.attn_force_fp32:
            gv = (act(g).astype(jnp.float32) * act(v).astype(jnp.float32)).astype(x.dtype)
        else:
            gv = act(g) * act(v)
        x = Conv2d(self.embed_dims, self.embed_dims, 1, name="proj_2")(gv)
        x = x + shortcut
        return Nonlocal(self.embed_dims, attn_impl=self.attn_impl, name="denoising_module")(x, train)


class CFAModule(nn.Module):
    """CFAM block (reference ``cfam.py:309-374``): pre-norm MCA and pre-norm
    channel-MLP, each with layer-scale residuals."""

    embed_dims: int
    ffn_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    act_type: str = "gelu"
    norm_type: str = "BN"
    init_value: float = 1e-5
    attn_act_type: str = "silu"
    mca_rates: Sequence[int] = (6, 12, 18)
    attn_force_fp32: bool = False
    pool_act: str = "leakyrelu_001"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        dim = self.embed_dims
        ls_init = lambda key, shape: jnp.full(shape, self.init_value, jnp.float32)
        layer_scale_1 = self.param("layer_scale_1", ls_init, (dim,))
        layer_scale_2 = self.param("layer_scale_2", ls_init, (dim,))
        drop_path = DropPath(self.drop_path_rate)

        identity = x
        y = build_norm(self.norm_type, dim, "norm1")(x, train) if self.norm_type in ("BN", "SyncBN") else build_norm(self.norm_type, dim, "norm1")(x)
        y = MCA(
            dim,
            rates=self.mca_rates,
            attn_act_type=self.attn_act_type,
            attn_force_fp32=self.attn_force_fp32,
            pool_act=self.pool_act,
            attn_impl=self.attn_impl,
            name="mca",
        )(y, train)
        x = identity + drop_path(layer_scale_1.astype(y.dtype) * y, deterministic)

        identity = x
        y = build_norm(self.norm_type, dim, "norm2")(x, train) if self.norm_type in ("BN", "SyncBN") else build_norm(self.norm_type, dim, "norm2")(x)
        y = CAggMlp(
            dim, int(dim * self.ffn_ratio), 3, self.act_type, self.drop_rate, name="mlp"
        )(y, train, deterministic)
        x = identity + drop_path(layer_scale_2.astype(y.dtype) * y, deterministic)
        return x
