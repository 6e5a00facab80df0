"""DSEB: Dual Selective Enhancement Block for skip connections.

Covers the reference's full ``use_command`` surface (``modules/dseb.py:79-165``):
'no', 'dat', 'fea', 'dog', 'seq' and combinations; default 'dat-fea' as used by the
cenet decoder. Also the cenet_org ``SkipEnhancer`` (DoG-edge + diff-attn,
``cenet_org/decoders.py:112-146``).

Tokenization quirk — replicated exactly: the reference tokenizes NCHW feature maps
with a raw ``.view(B, HW, C)`` (``dseb.py:114-118``) — a memory reinterpretation, not
a transpose — so "tokens" interleave channels and space. We reproduce it by
transposing NHWC→NCHW and reshaping row-major, which is the identical permutation.
Checkpoint parity depends on this.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.attention import MultiheadDiffAttn
from cenet_tpu.nn.layers import Conv2d, shifted_normal_init


class FEA(nn.Module):
    """Feature Edge Amplification (reference ``dseb.py:26-76``).

    Per scale s: edge_s = |x − up(down(x, s))|; output x + w · mean over pairwise
    |edge_i − edge_j| (upper-triangle pairs, weight 1/m each); w ~ N(0,1)+0.5.
    """

    dim: int
    scale_factors: Sequence[float]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = x.shape[1], x.shape[2]
        n = len(self.scale_factors)
        m = n * (n - 1) // 2
        edges = []
        for s in self.scale_factors:
            x1 = F.resize_bilinear_by_scale(x, float(s), align_corners=False)
            x1 = F.resize_bilinear(x1, (H, W), align_corners=False)
            edges.append(jnp.abs(x - x1))
        w_edge = jnp.zeros_like(x)
        for i in range(n):
            for j in range(i + 1, n):
                w_edge = w_edge + (1.0 / m) * jnp.abs(edges[i] - edges[j])
        w = self.param("w", shifted_normal_init(0.5), (self.dim,), jnp.float32)
        return x + w.astype(x.dtype) * w_edge


def tokenize_torch_view(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """NCHW ``.view(B, HW, C)`` raw reinterpretation (reference ``dseb.py:115``)."""
    b, h, w, c = x_nhwc.shape
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    return x_nchw.reshape(b, h * w, c)


def untokenize_torch_view(tok: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse raw ``.view(B, C, H, W)`` (reference ``dseb.py:117``), back to NHWC."""
    b, n, c = tok.shape
    x_nchw = tok.reshape(b, c, h, w)
    return jnp.transpose(x_nchw, (0, 2, 3, 1))


class DSEBlock(nn.Module):
    """Dual Selective Enhancement skip block (reference ``dseb.py:79-165``)."""

    dim: int
    scale_factors: Sequence[float]
    num_heads: int
    input_size: int
    mode: str = "add"  # 'add' | 'cat'
    use_command: str = "dat-fea"
    depth: int = 1
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, skip: jnp.ndarray, dec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cmd = self.use_command.lower()
        if "no" in cmd:
            return skip
        use_dat = "dat" in cmd
        use_fea = "fea" in cmd
        use_dog = "dog" in cmd
        do_seq = "seq" in cmd
        mode = self.mode.lower()
        _dim = self.dim * 2 if mode == "cat" else self.dim

        y = dec + skip if mode == "add" else jnp.concatenate([dec, skip], axis=-1)

        x_fea = FEA(_dim, self.scale_factors, name="boundary")(y) + y if use_fea else 0
        x_dog = (self._apply_dog(y, _dim) + y) if use_dog else 0
        if do_seq:
            y = x_fea + x_dog if (use_fea or use_dog) else y
            x_fea = x_dog = 0
        if use_dat:
            tok = tokenize_torch_view(y)
            diff = MultiheadDiffAttn(
                _dim, depth=self.depth, num_heads=self.num_heads, attn_impl=self.attn_impl, name="diffattn"
            )(tok)
            diff = untokenize_torch_view(diff, y.shape[1], y.shape[2])
            x_dat = diff * y
        else:
            x_dat = 0
        z = x_fea + x_dog + x_dat if (use_fea or use_dog or use_dat) else y
        z = Conv2d(_dim, self.dim, 1, use_bias=False, name="mixer")(z)
        return z + skip

    def _apply_dog(self, y: jnp.ndarray, _dim: int) -> jnp.ndarray:
        """Difference-of-Gaussians with learnable per-channel σ (reference ``dseb.py:120-151``)."""
        sigma_raw_1 = self.param("sigma_raw_1", shifted_normal_init(-0.4), (_dim,), jnp.float32)
        sigma_raw_2 = self.param("sigma_raw_2", shifted_normal_init(0.0), (_dim,), jnp.float32)
        return _gaussian_smooth_3x3(y, sigma_raw_1) - _gaussian_smooth_3x3(y, sigma_raw_2)


def _gaussian_smooth_3x3(x: jnp.ndarray, sigma_raw: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3×3 Gaussian with σ = 2·sigmoid(raw) per channel (``dseb.py:120-146``)."""
    c = x.shape[-1]
    sigma = 2.0 * jax.nn.sigmoid(sigma_raw)  # (C,)
    coords = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    gx = coords[:, None] ** 2 + coords[None, :] ** 2  # (3,3)
    kernel = jnp.exp(-gx[None, :, :] / (2.0 * jnp.square(sigma)[:, None, None]))  # (C,3,3)
    # Reference quirk (dseb.py:135): the (1,C,3,3) torch kernel is normalized by
    # ``kernel.sum(dim=[0,1], keepdim=True)`` — a per-TAP sum ACROSS channels, not a
    # per-channel sum over the 9 taps. Each channel's kernel does NOT sum to 1;
    # replicated bit-for-bit for checkpoint parity (tests/test_reference_parity.py).
    kernel = kernel / jnp.sum(kernel, axis=0, keepdims=True)
    rhs = kernel.transpose(1, 2, 0)[:, :, None, :].astype(x.dtype)  # HWIO (3,3,1,C)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class DoGEdge(nn.Module):
    """Two-scale difference edge (cenet_org, ``cenet_org/decoders.py:112-125``)."""

    dim: int
    scale_factors: Sequence[float]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = x.shape[1], x.shape[2]
        x1 = F.resize_bilinear_by_scale(x, float(self.scale_factors[0]), align_corners=False)
        x2 = F.resize_bilinear_by_scale(x, float(self.scale_factors[1]), align_corners=False)
        x1 = F.resize_bilinear(x1, (H, W), align_corners=False)
        x2 = F.resize_bilinear(x2, (H, W), align_corners=False)
        w = self.param("w", lambda key, shape: jnp.full(shape, 0.5, jnp.float32), (self.dim,))
        return x + w.astype(x.dtype) * jnp.abs(x1 - x2)


class SkipEnhancer(nn.Module):
    """cenet_org skip block (``cenet_org/decoders.py:128-146``): DoGEdge → diff-attn
    (depth=1) × tokens → y + diff → 1×1 proj (cat mode) → + skip."""

    dim: int
    scale_factors: Sequence[float]
    num_heads: int
    input_size: int
    mode: str = "add"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, skip: jnp.ndarray, dec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mode = self.mode.lower()
        _dim = self.dim * 2 if mode == "cat" else self.dim
        y = dec + skip if mode == "add" else jnp.concatenate([dec, skip], axis=-1)
        y = DoGEdge(_dim, self.scale_factors, name="boundary")(y)
        tok = tokenize_torch_view(y)
        diff = MultiheadDiffAttn(_dim, depth=1, num_heads=self.num_heads, attn_impl=self.attn_impl, name="diffattn")(tok)
        diff = diff * tok
        diff = untokenize_torch_view(diff, y.shape[1], y.shape[2])
        z = y + diff
        if mode == "cat":
            z = Conv2d(_dim, self.dim, 1, use_bias=True, name="proj")(z)
        return z + skip
