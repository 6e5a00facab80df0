"""Tensor-parallel attention: shard_map-wrapped cores must match unsharded math.

The '@model' attn_impl suffix (ops/flash_attention.parse_impl) runs the fused
cores head-local per device via shard_map — instead of GSPMD's all-gather around
un-partitionable Pallas custom calls. On the virtual 8-device CPU mesh we verify:

* the plain cores (xla/chunked) under shard_map == the bare cores;
* the fused Pallas diff-attention kernels, forced through the kernel path in
  INTERPRET mode, under shard_map == the exact decomposition, forward AND grads;
* the Trainer auto-tags the impl when the mesh has a model axis, and a whole
  TP forward with 'pallas@model' (interpret) == the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cenet_tpu.core.mesh import MeshConfig, make_mesh, set_attention_mesh, shard_batch


@pytest.fixture
def tp_mesh():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    set_attention_mesh(mesh)
    yield mesh
    set_attention_mesh(None)


@pytest.fixture
def pallas_interpret(monkeypatch):
    """Route every attention site through the Pallas kernels, emulated on CPU."""
    from cenet_tpu.ops import flash_attention, pallas_attention

    monkeypatch.setattr(pallas_attention, "_INTERPRET", True)
    monkeypatch.setattr(flash_attention, "_SMALL_LIMIT", 0)


def _qkv(rng, b, h, n, d, dv=None):
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, dv or d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("impl", ["xla", "chunked"])
def test_shard_heads_core_matches_bare(tp_mesh, rng, impl):
    from cenet_tpu.nn.attention import get_attention_core, xla_attention_core

    q, k, v = _qkv(rng, 4, 8, 96, 16)
    ref = xla_attention_core(q, k, v)
    out = get_attention_core(f"{impl}@model")(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_shard_heads_indivisible_heads_fall_through(tp_mesh, rng):
    """h=5 doesn't divide model=2 — must silently run the bare core."""
    from cenet_tpu.nn.attention import get_attention_core, xla_attention_core

    q, k, v = _qkv(rng, 2, 5, 64, 16)
    ref = xla_attention_core(q, k, v)
    out = get_attention_core("chunked@model")(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_diff_interleaved_tp_pallas_matches_decomposition(tp_mesh, pallas_interpret, rng):
    """Fused interleaved diff-attention kernel, head-local under shard_map
    (head PAIRS stay intact per device), vs the exact two-core decomposition:
    forward and all input grads + dλ."""
    from cenet_tpu.ops.flash_attention import diff_attention_interleaved

    b, h2, n, d, dv = 4, 8, 128, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h2 // 2, n, dv)), jnp.float32)
    lam = jnp.float32(0.35)

    def run(impl):
        def f(q, k, v, lam):
            return (diff_attention_interleaved(q, k, v, lam, impl=impl) ** 2).sum()

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(q, k, v, lam)
        return val, grads

    val_ref, g_ref = run("chunked")
    val_tp, g_tp = run("pallas@model")
    np.testing.assert_allclose(float(val_tp), float(val_ref), rtol=1e-4)
    for a, b_ in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


def test_diff_core_tp_matches_decomposition(tp_mesh, pallas_interpret, rng):
    from cenet_tpu.ops.flash_attention import diff_attention_core

    b, h, n, d, dv = 4, 4, 128, 8, 16
    q1, k1, _ = _qkv(rng, b, h, n, d)
    q2, k2, _ = _qkv(rng, b, h, n, d)
    v = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)
    lam = jnp.float32(0.4)
    ref = diff_attention_core(q1, k1, q2, k2, v, lam, impl="chunked")
    out = diff_attention_core(q1, k1, q2, k2, v, lam, impl="pallas@model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_trainer_auto_tags_model_axis(tp_mesh):
    from cenet_tpu.core.config import get_preset
    from cenet_tpu.train.trainer import Trainer

    cfg = get_preset("acdc")
    tr = Trainer(cfg, max_iterations=10, mesh=tp_mesh)
    assert tr.cfg.model.attn_impl.endswith("@model"), tr.cfg.model.attn_impl
    # data-parallel-only mesh must NOT tag
    dp = make_mesh(MeshConfig(data=8, model=1))
    set_attention_mesh(dp)
    tr_dp = Trainer(cfg, max_iterations=10, mesh=dp)
    assert "@" not in tr_dp.cfg.model.attn_impl
    set_attention_mesh(tp_mesh)


def test_tp_forward_pallas_interpret_matches_single_device(tp_mesh, pallas_interpret, rng):
    """Whole-model eval forward: TP-sharded params + 'pallas@model' (interpreted
    kernels, head-local shard_map) == single-device 'chunked' forward."""
    from cenet_tpu.core.config import get_preset
    from cenet_tpu.core.mesh import TP_ATTENTION_RULES, shard_params
    from cenet_tpu.train.trainer import Trainer

    cfg = get_preset("acdc")
    cfg = cfg.replace(
        model=cfg.model.__class__(
            input_channels=1, num_classes=4, scale_factors=(1.0, 0.5),
            diffatt_num_heads=(2, 2, 2), encoder="pvt_v2_b0", drop_path_rate=0.0,
            attn_impl="chunked",
        ),
        train=cfg.train.__class__(
            max_epochs=1, batch_size=4, base_lr=0.01, optimizer="sgd",
            scheduler="poly", loss_type="ce", loss_weights="1.0", amp=False,
        ),
    )
    images = jnp.asarray(rng.standard_normal((4, 64, 64, 1)), jnp.float32)

    set_attention_mesh(None)
    tr_s = Trainer(cfg, max_iterations=10)
    s_single = tr_s.init_state(jax.random.PRNGKey(0), (1, 64, 64, 1))
    probs_single = np.asarray(tr_s.eval_step(s_single, images))

    set_attention_mesh(tp_mesh)
    cfg_tp = cfg.replace(model=cfg.model.__class__(
        input_channels=1, num_classes=4, scale_factors=(1.0, 0.5),
        diffatt_num_heads=(2, 2, 2), encoder="pvt_v2_b0", drop_path_rate=0.0,
        attn_impl="pallas",
    ))
    tr_m = Trainer(cfg_tp, max_iterations=10, mesh=tp_mesh)
    assert tr_m.cfg.model.attn_impl == "pallas@model"
    s_tp = tr_m.init_state(jax.random.PRNGKey(0), (1, 64, 64, 1))
    s_tp.params = shard_params(tp_mesh, s_tp.params, TP_ATTENTION_RULES)
    b = shard_batch(tp_mesh, {"i": images})
    probs_tp = np.asarray(tr_m.eval_step(s_tp, b["i"]))

    np.testing.assert_allclose(probs_single, probs_tp, atol=5e-4)
