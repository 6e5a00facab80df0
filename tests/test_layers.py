"""Pin core layers (conv/convtranspose/norms) to torch numerical semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from cenet_tpu.nn import layers as L

KEY = jax.random.PRNGKey(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize(
    "cin,cout,k,s,p,d,groups",
    [
        (8, 16, 3, 1, 1, 1, 1),
        (8, 8, 3, 1, 2, 2, 8),  # dilated depthwise (SepConvBN)
        (6, 12, 7, 4, 3, 1, 1),  # PVT patch embed stage 1
        (16, 16, 5, 1, 2, 1, 1),
        (12, 4, 1, 1, 0, 1, 1),
    ],
)
def test_conv2d_matches_torch(rng, cin, cout, k, s, p, d, groups):
    x = rng.standard_normal((2, 17, 19, cin)).astype(np.float32)
    tconv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=groups, bias=True)
    mod = L.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=groups, use_bias=True)
    params = mod.init(KEY, jnp.asarray(x))
    # load torch weights: OIHW → HWIO
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = tconv.bias.detach().numpy()
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = tconv(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (2, 2, 0, 0), (5, 2, 2, 1)])
def test_convtranspose2d_matches_torch(rng, k, s, p, op):
    cin, cout = 6, 4
    x = rng.standard_normal((2, 9, 11, cin)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(cin, cout, k, stride=s, padding=p, output_padding=op, bias=True)
    mod = L.ConvTranspose2d(cin, cout, k, stride=s, padding=p, output_padding=op, use_bias=True)
    w = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)  # (I,O,kh,kw) → (kh,kw,I,O)
    b = tconv.bias.detach().numpy()
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = tconv(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-4)


def test_batchnorm_train_and_eval_match_torch(rng):
    c = 5
    x1 = rng.standard_normal((4, 7, 7, c)).astype(np.float32) * 3 + 1
    x2 = rng.standard_normal((4, 7, 7, c)).astype(np.float32)
    tbn = tnn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    mod = L.BatchNorm(c, eps=1e-5, momentum=0.1)
    variables = mod.init(KEY, jnp.asarray(x1), train=False)
    state = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    tbn.train()
    for x in [x1, x2]:
        ref = tbn(torch.from_numpy(to_nchw(x))).detach().numpy()
        ours, mutated = mod.apply(state, jnp.asarray(x), train=True, mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mutated["batch_stats"]}
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), atol=1e-4, rtol=1e-4)

    # running stats must match after two steps
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    tbn.eval()
    x3 = rng.standard_normal((2, 7, 7, c)).astype(np.float32)
    ref = tbn(torch.from_numpy(to_nchw(x3))).detach().numpy()
    ours = mod.apply(state, jnp.asarray(x3), train=False)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), atol=1e-4, rtol=1e-4)


def test_batchnorm1d_matches_torch(rng):
    c = 6
    x = rng.standard_normal((8, c)).astype(np.float32)
    tbn = tnn.BatchNorm1d(c)
    mod = L.BatchNorm(c)
    variables = mod.init(KEY, jnp.asarray(x), train=False)
    state = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    tbn.train()
    ref = tbn(torch.from_numpy(x)).detach().numpy()
    ours, _ = mod.apply(state, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_layernorm_matches_torch(rng):
    c = 64
    x = rng.standard_normal((2, 10, c)).astype(np.float32)
    tln = tnn.LayerNorm(c, eps=1e-6)
    with torch.no_grad():
        tln.weight.copy_(torch.rand(c))
        tln.bias.copy_(torch.rand(c))
    mod = L.LayerNorm(c, eps=1e-6)
    params = {
        "params": {
            "weight": jnp.asarray(tln.weight.detach().numpy()),
            "bias": jnp.asarray(tln.bias.detach().numpy()),
        }
    }
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = tln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_rmsnorm_fp32_semantics(rng):
    c = 32
    x = rng.standard_normal((3, 5, c)).astype(np.float32)
    mod = L.RMSNorm(c, eps=1e-5, affine=False)
    ours = np.asarray(mod.apply({"params": {}}, jnp.asarray(x)))
    ref = x * (1.0 / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-5))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
    # bf16 input: stats in fp32, result cast back to bf16
    xb = jnp.asarray(x, jnp.bfloat16)
    out_b = mod.apply({"params": {}}, xb)
    assert out_b.dtype == jnp.bfloat16


def test_groupnorm_matches_torch(rng):
    c = 8
    x = rng.standard_normal((2, 5, 5, c)).astype(np.float32)
    tgn = tnn.GroupNorm(c, c, eps=1e-5)  # reference uses GN with groups=channels
    mod = L.GroupNorm(c, c, eps=1e-5)
    variables = mod.init(KEY, jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    ref = tgn(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-5, rtol=1e-5)
