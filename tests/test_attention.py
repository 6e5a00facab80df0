"""Parity tests for attention modules vs torch equivalents written from spec."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cenet_tpu.nn.attention import MultiheadDiffAttn, Nonlocal, SRAAttention, lambda_init_fn
from cenet_tpu.nn.dseb import tokenize_torch_view, untokenize_torch_view

KEY = jax.random.PRNGKey(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def lin_w(tlin):
    return jnp.asarray(tlin.weight.detach().numpy().T)


class TorchDiffAttn(tnn.Module):
    """Differential attention written from the DIFF-Transformer spec (non-causal)."""

    def __init__(self, embed_dim, depth, num_heads):
        super().__init__()
        self.h = num_heads
        self.hd = embed_dim // num_heads // 2
        self.scaling = self.hd ** -0.5
        self.q_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.k_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.v_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.out_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.lambda_init = 0.8 - 0.6 * math.exp(-0.3 * depth)
        g = torch.Generator().manual_seed(7)
        self.lambda_q1 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_k1 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_q2 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_k2 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)

    def forward(self, x):
        b, n, e = x.shape
        q = self.q_proj(x).view(b, n, 2 * self.h, self.hd).transpose(1, 2)
        k = self.k_proj(x).view(b, n, 2 * self.h, self.hd).transpose(1, 2)
        v = self.v_proj(x).view(b, n, self.h, 2 * self.hd).transpose(1, 2)
        q = q * self.scaling
        aw = torch.matmul(q, k.transpose(-1, -2))
        aw = torch.nan_to_num(aw)
        aw = tF.softmax(aw, dim=-1, dtype=torch.float32).type_as(aw)
        l1 = torch.exp(torch.sum(self.lambda_q1 * self.lambda_k1))
        l2 = torch.exp(torch.sum(self.lambda_q2 * self.lambda_k2))
        lam = l1 - l2 + self.lambda_init
        aw = aw.view(b, self.h, 2, n, n)
        aw = aw[:, :, 0] - lam * aw[:, :, 1]
        attn = torch.matmul(aw, v)
        # RMSNorm(2*hd) affine-free, fp32
        attn32 = attn.float()
        attn = (attn32 * torch.rsqrt(attn32.pow(2).mean(-1, keepdim=True) + 1e-5)).type_as(attn)
        attn = attn * (1 - self.lambda_init)
        attn = attn.transpose(1, 2).reshape(b, n, self.h * 2 * self.hd)
        return self.out_proj(attn)


def test_diffattn_matches_torch(rng):
    e, heads, depth, n = 32, 4, 2, 49
    tmod = TorchDiffAttn(e, depth, heads).eval()
    x = rng.standard_normal((2, n, e)).astype(np.float32)
    mod = MultiheadDiffAttn(e, depth=depth, num_heads=heads)
    variables = {
        "params": {
            "q_proj": {"weight": lin_w(tmod.q_proj)},
            "k_proj": {"weight": lin_w(tmod.k_proj)},
            "v_proj": {"weight": lin_w(tmod.v_proj)},
            "out_proj": {"weight": lin_w(tmod.out_proj)},
            "lambda_q1": jnp.asarray(tmod.lambda_q1.detach().numpy()),
            "lambda_k1": jnp.asarray(tmod.lambda_k1.detach().numpy()),
            "lambda_q2": jnp.asarray(tmod.lambda_q2.detach().numpy()),
            "lambda_k2": jnp.asarray(tmod.lambda_k2.detach().numpy()),
        }
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    ref = tmod(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_lambda_init_values():
    assert abs(lambda_init_fn(1) - (0.8 - 0.6 * math.exp(-0.3))) < 1e-12
    assert abs(lambda_init_fn(4) - (0.8 - 0.6 * math.exp(-1.2))) < 1e-12


class TorchNonlocal(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.theta = tnn.Conv2d(c, c, 1)
        self.phi = tnn.Conv2d(c, c, 1)
        self.g = tnn.Conv2d(c, c, 1)
        self.out = tnn.Conv2d(c, c, 1)
        self.bn = tnn.BatchNorm2d(c)
        self.w = tnn.Parameter(torch.tensor(0.5))
        self.c = c

    def forward(self, x):
        n, c, h, w = x.shape
        th = self.theta(x).view(n, c, -1)
        ph = self.phi(x).view(n, c, -1)
        g = self.g(x).view(n, c, -1)
        aff = torch.einsum("nch,ncp->nhp", th, ph) * (c ** -0.5)
        aff = tF.softmax(aff, dim=2)
        o = torch.einsum("nhg,ncg->nch", aff, g).view(n, c, h, w)
        p = self.bn(self.out(o))
        return (1 - self.w) * x + self.w * p


def test_nonlocal_matches_torch(rng):
    c = 8
    tmod = TorchNonlocal(c).eval()
    x = rng.standard_normal((2, 7, 7, c)).astype(np.float32)
    mod = Nonlocal(c)

    def cw(tc):
        return {"weight": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(tc.bias.detach().numpy())}

    variables = {
        "params": {
            "conv_theta": cw(tmod.theta),
            "conv_phi": cw(tmod.phi),
            "conv_g": cw(tmod.g),
            "conv_out": cw(tmod.out),
            "bn": {"weight": jnp.asarray(tmod.bn.weight.detach().numpy()),
                   "bias": jnp.asarray(tmod.bn.bias.detach().numpy())},
            "w": jnp.asarray(0.5, jnp.float32),
        },
        "batch_stats": {"bn": {"mean": jnp.zeros(c), "var": jnp.ones(c)}},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-3)


class TorchSRA(tnn.Module):
    def __init__(self, dim, heads, sr, qkv_bias=True):
        super().__init__()
        self.h, self.sr_ratio = heads, sr
        self.scale = (dim // heads) ** -0.5
        self.q = tnn.Linear(dim, dim, bias=qkv_bias)
        self.kv = tnn.Linear(dim, dim * 2, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim)
        if sr > 1:
            self.sr = tnn.Conv2d(dim, dim, sr, sr)
            self.norm = tnn.LayerNorm(dim)

    def forward(self, x, H, W):
        b, n, c = x.shape
        q = self.q(x).reshape(b, n, self.h, c // self.h).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(b, c, H, W)
            x_ = self.sr(x_).reshape(b, c, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(b, -1, 2, self.h, c // self.h).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


def test_sra_attention_matches_torch(rng):
    dim, heads, sr, H, W = 16, 2, 4, 8, 8
    tmod = TorchSRA(dim, heads, sr).eval()
    x = rng.standard_normal((2, H * W, dim)).astype(np.float32)
    mod = SRAAttention(dim, num_heads=heads, qkv_bias=True, sr_ratio=sr)
    variables = {
        "params": {
            "q": {"weight": lin_w(tmod.q), "bias": jnp.asarray(tmod.q.bias.detach().numpy())},
            "kv": {"weight": lin_w(tmod.kv), "bias": jnp.asarray(tmod.kv.bias.detach().numpy())},
            "proj": {"weight": lin_w(tmod.proj), "bias": jnp.asarray(tmod.proj.bias.detach().numpy())},
            "sr": {"weight": jnp.asarray(tmod.sr.weight.detach().numpy().transpose(2, 3, 1, 0)),
                   "bias": jnp.asarray(tmod.sr.bias.detach().numpy())},
            "norm": {"weight": jnp.asarray(tmod.norm.weight.detach().numpy()),
                     "bias": jnp.asarray(tmod.norm.bias.detach().numpy())},
        }
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), H, W))
    ref = tmod(torch.from_numpy(x), H, W).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_tokenize_view_quirk_matches_torch(rng):
    """The DSEB .view-without-permute tokenization must match torch bit-for-bit."""
    b, c, h, w = 2, 6, 4, 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    xt = torch.from_numpy(to_nchw(x)).contiguous()
    ref_tok = xt.view(b, -1, c).numpy()
    ours_tok = np.asarray(tokenize_torch_view(jnp.asarray(x)))
    np.testing.assert_array_equal(ours_tok, ref_tok)
    # round trip back through the raw view
    ref_back = torch.from_numpy(ref_tok).view(b, c, h, w).numpy()
    ours_back = np.asarray(untokenize_torch_view(jnp.asarray(ours_tok), h, w))
    np.testing.assert_array_equal(ours_back, to_nhwc(ref_back))


def test_chunked_core_matches_naive(rng):
    """The chunked attention core must match the naive fp32-softmax core exactly."""
    from cenet_tpu.nn.attention import xla_attention_core
    from cenet_tpu.ops.flash_attention import chunked_attention_core

    q = jnp.asarray(rng.standard_normal((2, 4, 100, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 100, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 100, 24)), jnp.float32)
    ref = xla_attention_core(q, k, v)
    got = chunked_attention_core(q, k, v, q_chunk=32)  # non-divisible → padding path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_diffattn_chunked_matches_naive(rng):
    e, heads, depth, n = 32, 4, 2, 49
    x = rng.standard_normal((2, n, e)).astype(np.float32)
    mod_naive = MultiheadDiffAttn(e, depth=depth, num_heads=heads, attn_impl="xla")
    mod_chunk = MultiheadDiffAttn(e, depth=depth, num_heads=heads, attn_impl="chunked")
    variables = mod_naive.init(jax.random.PRNGKey(3), jnp.asarray(x))
    ref = np.asarray(mod_naive.apply(variables, jnp.asarray(x)))
    got = np.asarray(mod_chunk.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_diffattn_gqa_repeat_kv(rng):
    """GQA: kv heads < q heads via repeat_kv (reference :17-26,51-52)."""
    e, heads, kv_heads, n = 32, 4, 2, 25
    x = rng.standard_normal((1, n, e)).astype(np.float32)
    mod = MultiheadDiffAttn(e, depth=1, num_heads=heads, num_kv_heads=kv_heads, attn_impl="xla")
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # k/v projections are embed//n_rep wide
    assert v["params"]["k_proj"]["weight"].shape == (e, e // 2)
    assert v["params"]["v_proj"]["weight"].shape == (e, e // 2)
    out = mod.apply(v, jnp.asarray(x))
    assert out.shape == (1, n, e)
    assert np.isfinite(np.asarray(out)).all()


class TorchDiffAttnCross(tnn.Module):
    """Cross differential attention from spec (V1: query from decoder, spatial residual)."""

    def __init__(self, embed_dim, depth, num_heads):
        super().__init__()
        self.h = num_heads
        self.hd = embed_dim // num_heads // 2
        self.scaling = self.hd ** -0.5
        self.q_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.k_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.v_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.out_proj = tnn.Linear(embed_dim, embed_dim, bias=False)
        self.lambda_init = 0.8 - 0.6 * math.exp(-0.3 * depth)
        g = torch.Generator().manual_seed(11)
        self.lambda_q1 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_k1 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_q2 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)
        self.lambda_k2 = tnn.Parameter(torch.randn(self.hd, generator=g) * 0.1)

    def forward(self, x_nchw, q_nchw):
        x_res = x_nchw
        b, c, hh, ww = x_nchw.shape
        x = x_nchw.contiguous().view(b, -1, c)  # the same raw .view tokenization
        qs = q_nchw.contiguous().view(b, -1, c)
        n = x.shape[1]
        q = self.q_proj(qs).view(b, n, 2 * self.h, self.hd).transpose(1, 2) * self.scaling
        k = self.k_proj(x).view(b, n, 2 * self.h, self.hd).transpose(1, 2)
        v = self.v_proj(x).view(b, n, self.h, 2 * self.hd).transpose(1, 2)
        aw = tF.softmax(torch.matmul(q, k.transpose(-1, -2)), dim=-1, dtype=torch.float32).type_as(x)
        lam = torch.exp(torch.sum(self.lambda_q1 * self.lambda_k1)) - torch.exp(
            torch.sum(self.lambda_q2 * self.lambda_k2)) + self.lambda_init
        aw = aw.view(b, self.h, 2, n, n)
        aw = aw[:, :, 0] - lam * aw[:, :, 1]
        attn = torch.matmul(aw, v)
        a32 = attn.float()
        attn = (a32 * torch.rsqrt(a32.pow(2).mean(-1, keepdim=True) + 1e-5)).type_as(attn)
        attn = attn * (1 - self.lambda_init)
        attn = attn.transpose(1, 2).reshape(b, n, 2 * self.h * self.hd)
        attn = self.out_proj(attn)
        attn = attn.view(b, c, hh, ww)  # raw view back
        return attn + x_res


def test_diffattn_cross_v1_matches_torch(rng):
    from cenet_tpu.nn.attention import MultiheadDiffAttnCross

    e, heads, depth, hw = 16, 2, 1, 6
    tmod = TorchDiffAttnCross(e, depth, heads).eval()
    x = rng.standard_normal((2, hw, hw, e)).astype(np.float32)
    qs = rng.standard_normal((2, hw, hw, e)).astype(np.float32)
    mod = MultiheadDiffAttnCross(e, depth=depth, num_heads=heads, variant="v1", spatial=hw)
    variables = {
        "params": {
            "q_proj": {"weight": lin_w(tmod.q_proj)},
            "k_proj": {"weight": lin_w(tmod.k_proj)},
            "v_proj": {"weight": lin_w(tmod.v_proj)},
            "out_proj": {"weight": lin_w(tmod.out_proj)},
            "lambda_q1": jnp.asarray(tmod.lambda_q1.detach().numpy()),
            "lambda_k1": jnp.asarray(tmod.lambda_k1.detach().numpy()),
            "lambda_q2": jnp.asarray(tmod.lambda_q2.detach().numpy()),
            "lambda_k2": jnp.asarray(tmod.lambda_k2.detach().numpy()),
        }
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(qs)))
    ref = tmod(torch.from_numpy(to_nchw(x)), torch.from_numpy(to_nchw(qs))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=2e-4, rtol=1e-3)


def test_diffattn_cross_v2_matches_actual_reference(rng):
    """V2 cross attention (query from encoder, no residual) vs the ACTUAL reference
    module (multihead_diffattn.py:250-367), weights copied directly."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference, reference_available

    if not reference_available():
        import pytest

        pytest.skip("reference checkout unavailable")
    load_reference()
    from networks.cenet.modules.multihead_diffattn import MultiheadDiffAttnCrossV2

    from cenet_tpu.nn.attention import MultiheadDiffAttnCross

    e, heads, depth, hw = 16, 2, 1, 6
    tmod = MultiheadDiffAttnCrossV2(e, depth, heads, H=hw, W=hw).eval()
    x = rng.standard_normal((2, hw, hw, e)).astype(np.float32)
    qs = rng.standard_normal((2, hw, hw, e)).astype(np.float32)
    mod = MultiheadDiffAttnCross(e, depth=depth, num_heads=heads, variant="v2", spatial=hw)
    variables = {
        "params": {
            "q_proj": {"weight": lin_w(tmod.q_proj)},
            "k_proj": {"weight": lin_w(tmod.k_proj)},
            "v_proj": {"weight": lin_w(tmod.v_proj)},
            "out_proj": {"weight": lin_w(tmod.out_proj)},
            "lambda_q1": jnp.asarray(tmod.lambda_q1.detach().numpy()),
            "lambda_k1": jnp.asarray(tmod.lambda_k1.detach().numpy()),
            "lambda_q2": jnp.asarray(tmod.lambda_q2.detach().numpy()),
            "lambda_k2": jnp.asarray(tmod.lambda_k2.detach().numpy()),
        }
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(qs)))
    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(to_nchw(x)).contiguous(), torch.from_numpy(to_nchw(qs)).contiguous()
        ).numpy()
    # reference raw-views (B, N, E) back to (B, E, W, H); same buffer as our
    # untokenize for square maps
    np.testing.assert_allclose(ours, to_nhwc(ref.reshape(2, e, hw, hw)), atol=2e-4, rtol=1e-3)


def test_sra_attn_drop_applied_in_train_mode(rng):
    """attn_drop must actually be applied post-softmax (reference pvtv2.py:88-90):
    deterministic mode is a no-op; train mode perturbs the output with the right
    expectation (inverted dropout: E[out] == no-drop out)."""
    dim, heads, H, W = 8, 2, 4, 4
    x = jnp.asarray(rng.standard_normal((1, H * W, dim)).astype(np.float32))
    mod0 = SRAAttention(dim, num_heads=heads, qkv_bias=True, sr_ratio=1, attn_drop=0.0)
    variables = mod0.init(jax.random.PRNGKey(0), x, H, W)
    base = np.asarray(mod0.apply(variables, x, H, W))

    mod = SRAAttention(dim, num_heads=heads, qkv_bias=True, sr_ratio=1, attn_drop=0.5)
    # deterministic: bit-identical to attn_drop=0 (torch eval() semantics)
    det = np.asarray(mod.apply(variables, x, H, W, deterministic=True))
    np.testing.assert_array_equal(det, base)
    # train mode: differs per-draw, matches in expectation (proj is linear in the
    # attention output, so the bias cancels in the average)
    outs = np.stack([
        np.asarray(mod.apply(variables, x, H, W, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(i)}))
        for i in range(400)
    ])
    assert np.abs(outs[0] - base).max() > 1e-4
    np.testing.assert_allclose(outs.mean(0), base, atol=0.12)


def test_sra_attn_drop_fused_cores_raise(rng):
    """The fused cores never materialize attention weights; attn_drop>0 in train
    mode must raise loudly instead of silently not applying it (VERDICT r3)."""
    import pytest

    dim, heads, H, W = 8, 2, 4, 4
    x = jnp.asarray(rng.standard_normal((1, H * W, dim)).astype(np.float32))
    mod = SRAAttention(dim, num_heads=heads, qkv_bias=True, sr_ratio=1,
                       attn_drop=0.5, attn_impl="pallas")
    variables = SRAAttention(dim, num_heads=heads, qkv_bias=True, sr_ratio=1).init(
        jax.random.PRNGKey(0), x, H, W)
    with pytest.raises(NotImplementedError, match="attn_drop"):
        mod.apply(variables, x, H, W, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(0)})
