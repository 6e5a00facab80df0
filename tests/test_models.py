"""Model-level smoke + invariant tests (shapes, param counts, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cenet_tpu.models.cenet import CENet, CENetOrg
from cenet_tpu.models.pvtv2 import make_pvt
from cenet_tpu.models.resnet import make_resnet

KEY = jax.random.PRNGKey(0)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def small_input():
    return jnp.asarray(np.random.default_rng(0).standard_normal((1, 224, 224, 1)), jnp.float32)


def test_pvt_b2_stage_shapes(small_input):
    x3 = jnp.concatenate([small_input] * 3, axis=-1)
    model = make_pvt("pvt_v2_b2")
    variables = model.init(KEY, x3)
    outs = model.apply(variables, x3)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [(1, 56, 56, 64), (1, 28, 28, 128), (1, 14, 14, 320), (1, 7, 7, 512)]
    # pvt_v2_b2 backbone ≈ 24.85M params (timm reference within 1%)
    assert abs(n_params(variables["params"]) / 1e6 - 24.85) < 0.6


def test_resnet18_stage_shapes(small_input):
    x3 = jnp.concatenate([small_input] * 3, axis=-1)
    model = make_resnet("resnet18")
    variables = model.init(KEY, x3, train=False)
    outs = model.apply(variables, x3, train=False)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [(1, 56, 56, 64), (1, 28, 28, 128), (1, 14, 14, 256), (1, 7, 7, 512)]


def test_cenet_synapse_config(small_input):
    """Full flagship model: Synapse config (9 classes, heads 16,8,8)."""
    model = CENet(
        input_channels=1, num_classes=9, scale_factors=(0.8, 0.4),
        diffatt_num_heads=(16, 8, 8), skip_mode="cat", dec_up_block="eucb",
        out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
    )
    variables = model.init(KEY, small_input, train=False)
    y = model.apply(variables, small_input, train=False)
    assert y.shape == (1, 224, 224, 9)
    total = n_params(variables["params"]) / 1e6
    # Reference reports 33.39M params (BASELINE.md); allow small slack for
    # counting conventions.
    assert abs(total - 33.39) < 1.0, f"param count {total:.2f}M"


def test_cenet_org_config(small_input):
    model = CENetOrg(input_channels=1, num_classes=9, scale_factors=(1.0, 0.75, 0.5)[:2], num_heads=(2, 2, 2))
    variables = model.init(KEY, small_input, train=False)
    y = model.apply(variables, small_input, train=False)
    assert y.shape == (1, 224, 224, 9)


def test_cenet_skin_3ch():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 224, 224, 3)), jnp.float32)
    model = CENet(input_channels=3, num_classes=2, diffatt_num_heads=(2, 2, 2))
    variables = model.init(KEY, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 224, 224, 2)


def test_cenet_train_mode_mutates_bn(small_input):
    model = CENet(input_channels=1, num_classes=4, diffatt_num_heads=(4, 4, 4))
    variables = model.init(KEY, small_input, train=False)
    y, mut = model.apply(
        variables, small_input, train=True, deterministic=True, mutable=["batch_stats"]
    )
    assert jnp.isfinite(y).all()
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mut["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def test_cenet_deterministic_eval(small_input):
    model = CENet(input_channels=1, num_classes=2, diffatt_num_heads=(2, 2, 2))
    variables = model.init(KEY, small_input, train=False)
    y1 = model.apply(variables, small_input, train=False)
    y2 = model.apply(variables, small_input, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_cenet_attn_impl_consistency(small_input):
    """pallas (CPU fallback=chunked) and chunked must agree with naive xla."""
    common = dict(input_channels=1, num_classes=2, diffatt_num_heads=(2, 2, 2),
                  drop_path_rate=0.0)
    m_naive = CENet(attn_impl="xla", **common)
    m_chunk = CENet(attn_impl="chunked", **common)
    m_pallas = CENet(attn_impl="pallas", **common)
    v = m_naive.init(KEY, small_input, train=False)
    y_naive = np.asarray(m_naive.apply(v, small_input, train=False))
    y_chunk = np.asarray(m_chunk.apply(v, small_input, train=False))
    y_pallas = np.asarray(m_pallas.apply(v, small_input, train=False))
    np.testing.assert_allclose(y_chunk, y_naive, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(y_pallas, y_naive, atol=2e-4, rtol=1e-3)


def test_cenet_resnet_encoder(small_input):
    model = CENet(input_channels=1, num_classes=4, encoder="resnet18", diffatt_num_heads=(2, 2, 2))
    variables = model.init(KEY, small_input, train=False)
    y = model.apply(variables, small_input, train=False)
    assert y.shape == (1, 224, 224, 4)
