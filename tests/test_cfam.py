"""Parity tests for the CFAM stack (CCU/SRM/MultiOrderDWConv split logic)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cenet_tpu.nn.cfam import CCU, SRM, _channel_indices

KEY = jax.random.PRNGKey(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TorchCCU(tnn.Module):
    def __init__(self, c, hs=3):
        super().__init__()
        self.fc1 = tnn.Conv1d(c, hs * c, kernel_size=3, groups=c, bias=False)
        self.fc2 = tnn.Conv1d(hs * c, c, kernel_size=1, groups=c, bias=False)
        self.bn = tnn.BatchNorm1d(c)

    def forward(self, x):
        b, c, h, w = x.shape
        x_max = torch.max(x.view(b, c, -1), dim=2)[0]
        x_mean = torch.mean(x, dim=(2, 3))
        x_std = torch.std(x, dim=(2, 3), unbiased=False)
        u = torch.stack([x_max, x_mean, x_std], dim=-1)
        z = self.fc2(tF.relu(self.fc1(u))).view(b, c)
        if b > 1:
            z = self.bn(z)
        g = torch.sigmoid(z).reshape(b, c, 1, 1)
        return x * g


def test_ccu_matches_torch(rng):
    c = 8
    tmod = TorchCCU(c).eval()
    with torch.no_grad():
        tmod.bn.running_mean.copy_(torch.randn(c) * 0.1)
        tmod.bn.running_var.copy_(torch.rand(c) + 0.5)
    x = rng.standard_normal((3, 9, 11, c)).astype(np.float32)
    mod = CCU(c)
    variables = {
        "params": {
            "fc1_weight": jnp.asarray(tmod.fc1.weight.detach().numpy()),
            "fc2_weight": jnp.asarray(tmod.fc2.weight.detach().numpy()),
            "bn": {"weight": jnp.asarray(tmod.bn.weight.detach().numpy()),
                   "bias": jnp.asarray(tmod.bn.bias.detach().numpy())},
        },
        "batch_stats": {"bn": {"mean": jnp.asarray(tmod.bn.running_mean.numpy()),
                               "var": jnp.asarray(tmod.bn.running_var.numpy())}},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-3)


def test_ccu_batch1_skips_bn(rng):
    """Batch-size-1 skips BatchNorm1d (reference ``cfam.py:260-261``)."""
    c = 8
    tmod = TorchCCU(c).eval()
    x = rng.standard_normal((1, 7, 7, c)).astype(np.float32)
    mod = CCU(c)
    variables = mod.init(KEY, jnp.asarray(x), train=False)
    params = dict(variables["params"])
    params["fc1_weight"] = jnp.asarray(tmod.fc1.weight.detach().numpy())
    params["fc2_weight"] = jnp.asarray(tmod.fc2.weight.detach().numpy())
    state = {"params": params}
    if "batch_stats" in variables:
        state["batch_stats"] = variables["batch_stats"]
    ours = np.asarray(mod.apply(state, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-3)


class TorchSRM(tnn.Module):
    def __init__(self):
        super().__init__()
        self.pwc = tnn.Conv2d(3, 1, 1, bias=False)
        self.dwc = tnn.Conv2d(3, 1, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(1)

    def forward(self, x):
        x_max = x.max(1, keepdim=True)[0]
        x_mean = x.mean(1, keepdim=True)
        x_std = x.std(1, keepdim=True)  # unbiased
        u = torch.cat([x_max, x_mean, x_std], dim=1)
        f = tF.gelu(self.pwc(u) + self.dwc(u))
        f = self.bn(f)
        return x * torch.sigmoid(f).expand_as(x)


def test_srm_matches_torch(rng):
    tmod = TorchSRM().eval()
    x = rng.standard_normal((2, 6, 6, 12)).astype(np.float32)
    mod = SRM()
    variables = {
        "params": {
            "pwc": {"weight": jnp.asarray(tmod.pwc.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "dwc": {"weight": jnp.asarray(tmod.dwc.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "bn": {"weight": jnp.asarray(tmod.bn.weight.detach().numpy()),
                   "bias": jnp.asarray(tmod.bn.bias.detach().numpy())},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros(1), "var": jnp.ones(1)}},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    ref = tmod(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-4, rtol=1e-3)


def test_channel_indices_exact_cover():
    """[5,5,5,1]/16 split must exactly tile the reference channel widths."""
    for dim, expected in [
        (64, [(0, 20), (20, 40), (40, 60), (60, 64)]),
        (128, [(0, 40), (40, 80), (80, 120), (120, 128)]),
        (320, [(0, 100), (100, 200), (200, 300), (300, 320)]),
        (512, [(0, 160), (160, 320), (320, 480), (480, 512)]),
    ]:
        got = _channel_indices(dim, (5, 5, 5, 1))
        assert got == expected, (dim, got)
        assert got[-1][1] == dim
