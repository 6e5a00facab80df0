"""Converter tests: torch-layout round trips and numeric equivalence on real torch modules."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from cenet_tpu.convert.torch2jax import convert_state_dict, torch_key_for
from cenet_tpu.models.pvtv2 import make_pvt

KEY = jax.random.PRNGKey(0)


def test_torch_key_mapping_samples():
    cases = [
        (("backbone", "patch_embed1", "proj", "weight"), "params", "cenet",
         "backbone.patch_embed1.proj.weight"),
        (("backbone", "block1_0", "attn", "q", "weight"), "params", "cenet",
         "backbone.block1.0.attn.q.weight"),
        (("backbone", "block3_5", "mlp", "dwconv", "dwconv", "weight"), "params", "cenet",
         "backbone.block3.5.mlp.dwconv.dwconv.weight"),
        (("decoder", "dec4", "mca", "gate", "bias"), "params", "cenet",
         "decoder.dec4.mca.gate.bias"),
        (("decoder", "dec4", "mca", "value", "dlp0", "depthwise", "weight"), "params", "cenet",
         "decoder.dec4.mca.value.dlps.0.depthwise.weight"),
        (("decoder", "dec4", "mca", "value", "pool_conv", "weight"), "params", "cenet",
         "decoder.dec4.mca.value.dlps.3.1.weight"),
        (("decoder", "dec4", "mca", "value", "pool_bn", "mean"), "batch_stats", "cenet",
         "decoder.dec4.mca.value.dlps.3.2.running_mean"),
        (("decoder", "dec4", "mca", "ccu", "fc1_weight"), "params", "cenet",
         "decoder.dec4.mca.ccu.fc1.weight"),
        (("decoder", "up3", "up_dwc", "weight"), "params", "cenet",
         "decoder.up3.up_dwc.1.weight"),
        (("decoder", "up3", "bn", "var"), "batch_stats", "cenet",
         "decoder.up3.up_dwc.2.running_var"),
        (("decoder", "up3", "pwc", "weight"), "params", "cenet",
         "decoder.up3.pwc.0.weight"),
        (("decoder", "skip_enhancer3", "diffattn", "lambda_q1"), "params", "cenet",
         "decoder.skip_enhancer3.diffattn.lambda_q1"),
        (("decoder", "skip_enhancer3", "boundary", "w"), "params", "cenet",
         "decoder.skip_enhancer3.boundary.w"),
        (("out", "rb", "conv1", "weight"), "params", "cenet",
         "out.rb.0.conv1.conv.weight"),
        (("out", "rb", "norm1", "weight"), "params", "cenet",
         "out.rb.0.norm1.weight"),
        (("out", "out_rb", "conv2", "weight"), "params", "cenet",
         "out.out.0.conv2.conv.weight"),
        (("out", "out_conv", "conv", "weight"), "params", "cenet",
         "out.out.1.conv.conv.weight"),
        (("out", "w"), "params", "cenet", "out.w"),
        # cenet_org renames
        (("decoder", "dec4", "mca", "ccu", "fc2_weight"), "params", "cenet_org",
         "decoder.dec4.attn.crm.fc2.weight"),
        (("decoder", "eucb3", "up_dwc", "weight"), "params", "cenet_org",
         "decoder.eucb3.up_dwc.1.weight"),
        (("conv_stem", "weight"), "params", "cenet_org", "conv.0.weight"),
        (("conv_stem_bn", "mean"), "batch_stats", "cenet_org", "conv.1.running_mean"),
        (("enc_rb", "conv1", "weight"), "params", "cenet_org", "enc.0.conv1.conv.weight"),
        # resnet
        (("backbone", "layer2_0", "downsample_conv", "weight"), "params", "cenet",
         "backbone.layer2.0.downsample.0.weight"),
    ]
    siblings = {
        "decoder/up3": {"up_dwc", "bn", "pwc"},  # EUCB structure
        "decoder/eucb3": {"up_dwc", "bn", "pwc"},
    }
    for path, coll, ver, expected in cases:
        got = torch_key_for(path, coll, ver, siblings)
        assert got == expected, f"{path} → {got}, expected {expected}"


def _torch_sd_for_variables(variables, model_version="cenet"):
    """Build a synthetic torch state_dict with correct torch layouts from our tree."""
    from cenet_tpu.convert.torch2jax import _flatten, expected_torch_keys

    keymap = expected_torch_keys(variables, model_version)
    sd = {}
    for coll in variables:
        for path, leaf in _flatten(variables[coll]):
            key = keymap[f"{coll}:" + "/".join(path)]
            arr = np.random.default_rng(abs(hash(key)) % 2**31).standard_normal(np.shape(leaf)).astype(np.float32)
            if arr.ndim == 4:
                t = arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
            elif arr.ndim == 2 and path[-1] == "weight":
                t = arr.T
            else:
                t = arr
            sd[key] = t
    return sd


def test_pvt_b0_full_round_trip():
    """Every pvt_v2_b0 param maps to a torch key and converts back bit-exactly."""
    model = make_pvt("pvt_v2_b0")
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(KEY, x))()
    variables = {"params": jax.tree.map(np.asarray, variables["params"])}
    sd = _torch_sd_for_variables(variables)
    new_vars, report = convert_state_dict(sd, variables, strict=True)
    assert not report["missing"] and not report["unused"]
    # numeric round trip on one conv + one linear
    w_ours = new_vars["params"]["patch_embed1"]["proj"]["weight"]
    np.testing.assert_array_equal(np.transpose(w_ours, (3, 2, 0, 1)), sd["backbone.patch_embed1.proj.weight"][...] if "backbone.patch_embed1.proj.weight" in sd else sd["patch_embed1.proj.weight"])


def test_cenet_full_key_coverage():
    """Every parameter of the flagship CENet (and CENetOrg) maps to a unique torch
    key and converts with no missing/unused entries."""
    from cenet_tpu.models.cenet import CENet, CENetOrg

    model = CENet(input_channels=1, num_classes=9, diffatt_num_heads=(16, 8, 8),
                  skip_mode="cat", dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn")
    x = jnp.zeros((1, 224, 224, 1), jnp.float32)
    variables = jax.jit(lambda: model.init(KEY, x, train=False))()
    variables = jax.tree.map(np.asarray, dict(variables))
    from cenet_tpu.convert.torch2jax import expected_torch_keys

    keys = expected_torch_keys(variables, "cenet")
    assert len(set(keys.values())) == len(keys), "duplicate torch keys"
    sd = _torch_sd_for_variables(variables, "cenet")
    _, report = convert_state_dict(sd, variables, "cenet", strict=True)
    assert not report["missing"] and not report["unused"]

    org = CENetOrg(input_channels=1, num_classes=9, num_heads=(2, 2, 2))
    v2 = jax.jit(lambda: org.init(KEY, x, train=False))()
    v2 = jax.tree.map(np.asarray, dict(v2))
    keys2 = expected_torch_keys(v2, "cenet_org")
    assert len(set(keys2.values())) == len(keys2)
    sd2 = _torch_sd_for_variables(v2, "cenet_org")
    _, report2 = convert_state_dict(sd2, v2, "cenet_org", strict=True)
    assert not report2["missing"] and not report2["unused"]


def test_linear_conversion_numeric(rng):
    """Conversion of a real torch Linear matches matmul semantics."""
    lin = tnn.Linear(8, 4)
    x = rng.standard_normal((2, 8)).astype(np.float32)
    ref = lin(torch.from_numpy(x)).detach().numpy()
    w = lin.weight.detach().numpy().T
    b = lin.bias.detach().numpy()
    ours = x @ w + b
    np.testing.assert_allclose(ours, ref, atol=1e-6)
