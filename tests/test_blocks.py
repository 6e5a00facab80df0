"""Parity tests for conv blocks vs independently-written torch equivalents."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cenet_tpu.nn import blocks as B

KEY = jax.random.PRNGKey(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def conv_w(tconv):
    return jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))


def bn_state(tbn):
    return (
        {"weight": jnp.asarray(tbn.weight.detach().numpy()), "bias": jnp.asarray(tbn.bias.detach().numpy())},
        {"mean": jnp.asarray(tbn.running_mean.numpy()), "var": jnp.asarray(tbn.running_var.numpy())},
    )


def randomize_bn(tbn, gen):
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(tbn.weight.shape, generator=gen) + 0.5)
        tbn.bias.copy_(torch.randn(tbn.bias.shape, generator=gen) * 0.1)
        tbn.running_mean.copy_(torch.randn(tbn.running_mean.shape, generator=gen) * 0.2)
        tbn.running_var.copy_(torch.rand(tbn.running_var.shape, generator=gen) + 0.5)


class TorchSepConvBN(tnn.Module):
    """Torch equivalent of the reference SepConvBN, written from its spec."""

    def __init__(self, cin, cout, k=3, rate=1, depth_activation=False, eps=1e-3):
        super().__init__()
        k_eff = k + (k - 1) * (rate - 1)
        pad = (k_eff - 1) // 2
        self.dw = tnn.Conv2d(cin, cin, k, 1, pad, dilation=rate, groups=cin, bias=False)
        self.dw_bn = tnn.BatchNorm2d(cin, eps=eps)
        self.pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.pw_bn = tnn.BatchNorm2d(cout, eps=eps)
        self.depth_activation = depth_activation

    def forward(self, x):
        if not self.depth_activation:
            x = tF.relu(x)
        x = self.dw_bn(self.dw(x))
        if self.depth_activation:
            x = tF.relu(x)
        x = self.pw_bn(self.pw(x))
        if self.depth_activation:
            x = tF.relu(x)
        return x


def test_sepconvbn_matches_torch(rng):
    gen = torch.Generator().manual_seed(0)
    cin, cout, rate = 8, 8, 4
    tmod = TorchSepConvBN(cin, cout, rate=rate, depth_activation=True, eps=1e-5).eval()
    randomize_bn(tmod.dw_bn, gen)
    randomize_bn(tmod.pw_bn, gen)
    x = rng.standard_normal((2, 14, 14, cin)).astype(np.float32)

    mod = B.SepConvBN(cin, cout, 3, rate=rate, depth_activation=True, epsilon=1e-5)
    dwp, dws = bn_state(tmod.dw_bn)
    pwp, pws = bn_state(tmod.pw_bn)
    variables = {
        "params": {
            "depthwise": {"weight": conv_w(tmod.dw)},
            "depthwise_bn": dwp,
            "pointwise": {"weight": conv_w(tmod.pw)},
            "pointwise_bn": pwp,
        },
        "batch_stats": {"depthwise_bn": dws, "pointwise_bn": pws},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


class TorchUnetResBlock(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1):
        super().__init__()
        p = (k - stride + 1) // 2
        self.conv1 = tnn.Conv2d(cin, cout, k, stride, p, bias=False)
        self.norm1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, k, 1, (k - 1 + 1) // 2, bias=False)
        self.norm2 = tnn.BatchNorm2d(cout)
        self.downsample = cin != cout or stride != 1
        if self.downsample:
            self.conv3 = tnn.Conv2d(cin, cout, 1, stride, 0, bias=False)
            self.norm3 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        out = tF.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        out = self.norm2(self.conv2(out))
        res = self.norm3(self.conv3(x)) if self.downsample else x
        return tF.leaky_relu(out + res, 0.01)


def test_unet_res_block_matches_torch(rng):
    gen = torch.Generator().manual_seed(1)
    cin, cout, k = 6, 10, 5
    tmod = TorchUnetResBlock(cin, cout, k).eval()
    for bn in [tmod.norm1, tmod.norm2, tmod.norm3]:
        randomize_bn(bn, gen)
    x = rng.standard_normal((2, 16, 16, cin)).astype(np.float32)
    mod = B.UnetResBlock(cin, cout, k, 1)
    n1p, n1s = bn_state(tmod.norm1)
    n2p, n2s = bn_state(tmod.norm2)
    n3p, n3s = bn_state(tmod.norm3)
    variables = {
        "params": {
            "conv1": {"weight": conv_w(tmod.conv1)},
            "norm1": n1p,
            "conv2": {"weight": conv_w(tmod.conv2)},
            "norm2": n2p,
            "conv3": {"weight": conv_w(tmod.conv3)},
            "norm3": n3p,
        },
        "batch_stats": {"norm1": n1s, "norm2": n2s, "norm3": n3s},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


class TorchEUCB(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1):
        super().__init__()
        self.up = tnn.Upsample(scale_factor=2)  # nearest
        self.dwc = tnn.Conv2d(cin, cin, k, stride, k // 2, groups=cin, bias=False)
        self.bn = tnn.BatchNorm2d(cin)
        self.pwc = tnn.Conv2d(cin, cout, 1, bias=True)

    def forward(self, x):
        x = tF.leaky_relu(self.bn(self.dwc(self.up(x))), 0.2)
        # channel_shuffle(groups=cin) is the identity
        return self.pwc(x)


def test_eucb_matches_torch(rng):
    gen = torch.Generator().manual_seed(2)
    cin, cout = 8, 4
    tmod = TorchEUCB(cin, cout).eval()
    randomize_bn(tmod.bn, gen)
    x = rng.standard_normal((2, 7, 7, cin)).astype(np.float32)
    mod = B.EUCB(cin, cout, 3, stride=1, activation="leakyrelu")
    bnp, bns = bn_state(tmod.bn)
    variables = {
        "params": {
            "up_dwc": {"weight": conv_w(tmod.dwc)},
            "bn": bnp,
            "pwc": {"weight": conv_w(tmod.pwc), "bias": jnp.asarray(tmod.pwc.bias.detach().numpy())},
        },
        "batch_stats": {"bn": bns},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


def test_uptconv_matches_torch(rng):
    cin, cout, k, s = 6, 4, 3, 2
    p = (k - s + 1) // 2
    op = 2 * p + s - k
    tconv = tnn.ConvTranspose2d(cin, cout, k, s, p, output_padding=op, bias=False)
    x = rng.standard_normal((1, 14, 14, cin)).astype(np.float32)
    mod = B.UpTConv(cin, cout, k, s)
    w = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 0, 1))
    variables = {"params": {"up": {"weight": w}}}
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tconv(torch.from_numpy(to_nchw(x))).detach().numpy()
    assert ours.shape[1] == 28
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


def test_dseb_use_command_variants(rng):
    """All reference use_command modes produce valid outputs (dseb.py:79-165)."""
    from cenet_tpu.nn.dseb import DSEBlock

    skip = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    dec = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    for cmd in ["no", "dat", "fea", "dog", "dat-fea", "dat-dog", "seq-dat-fea"]:
        mod = DSEBlock(16, scale_factors=(0.8, 0.4), num_heads=2, input_size=8,
                       mode="cat", use_command=cmd)
        v = mod.init(jax.random.PRNGKey(0), skip, dec)
        out = mod.apply(v, skip, dec)
        assert out.shape == skip.shape, cmd
        assert np.isfinite(np.asarray(out)).all(), cmd
        if cmd == "no":
            np.testing.assert_array_equal(np.asarray(out), np.asarray(skip))


def test_up_block_factory_all_kinds(rng):
    from cenet_tpu.nn.blocks import make_up_block

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)), jnp.float32)
    for kind in ["uprb", "eucb", "upcn", "uptc"]:
        blk = make_up_block(kind, 6, 4, 3)
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        y = blk.apply(v, x, train=False)
        assert y.shape == (1, 16, 16, 4), kind


def test_unet_res_block_s2d_equivalence(rng):
    """UnetResBlockS2D == UnetResBlock(k=5,s=1) + maxpool via phase-max: same
    params/batch-stats tree, same outputs (train AND eval), same updated stats."""
    from cenet_tpu.nn import functional as F

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    ref = B.UnetResBlock(1, 8, 5, 1)
    s2d = B.UnetResBlockS2D(1, 8, 5)
    vref = ref.init(jax.random.PRNGKey(0), x, True)
    vs2d = s2d.init(jax.random.PRNGKey(0), x, True)
    # identical trees (names AND shapes) — converter/checkpoint interchangeable
    assert jax.tree_util.tree_structure(vref) == jax.tree_util.tree_structure(vs2d)
    for a, b in zip(jax.tree.leaves(vref), jax.tree.leaves(vs2d)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # same init draws

    # eval path
    y_ref = F.max_pool2d(ref.apply(vref, x, False), 2, 2)
    y_s2d = F.depth_phase_max(s2d.apply(vref, x, False))
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref), atol=2e-6, rtol=2e-6)

    # train path: outputs and updated batch stats must match
    y_ref, mref = ref.apply(vref, x, True, mutable=["batch_stats"])
    y_s2d, ms2d = s2d.apply(vref, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(F.depth_phase_max(y_s2d)), np.asarray(F.max_pool2d(y_ref, 2, 2)), atol=2e-6, rtol=2e-6
    )
    for a, b in zip(jax.tree.leaves(mref), jax.tree.leaves(ms2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6, rtol=2e-6)

    # gradients flow identically through both formulations
    def loss(fn, v):
        return jnp.sum(jnp.square(fn(v)))

    g_ref = jax.grad(lambda v: loss(lambda v: ref.apply(v, x, False), v))(vref)["params"]
    g_s2d = jax.grad(lambda v: loss(lambda v: s2d.apply(v, x, False), v))(vref)["params"]
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-5)
