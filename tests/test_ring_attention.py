"""Sequence-parallel ring attention: exact parity with the naive core on the
virtual 8-device CPU mesh (SURVEY §2.7 SP/CP row; ops/ring_attention.py).

Tokens shard over a 'seq' mesh axis; k/v rotate via lax.ppermute with online
softmax rescaling. Must match xla_attention_core forward AND gradients, and
fall back cleanly when the mesh/shape doesn't apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cenet_tpu.core.mesh import MeshConfig, make_mesh, set_attention_mesh
from cenet_tpu.nn.attention import get_attention_core, xla_attention_core


@pytest.fixture
def seq_mesh():
    mesh = make_mesh(MeshConfig(data=1, seq=8, model=1))
    set_attention_mesh(mesh)
    yield mesh
    set_attention_mesh(None)


def _qkv(rng, b=2, h=4, n=64, d=16, dv=24):
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)
    return q, k, v


def test_seq_mesh_axes():
    mesh = make_mesh(MeshConfig(data=2, seq=2, model=2))
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    # default 2-axis mesh unchanged when seq == 1
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_ring_matches_naive_forward(seq_mesh, rng):
    q, k, v = _qkv(rng)
    ring = get_attention_core("ring@seq")
    want = xla_attention_core(q, k, v)
    got = ring(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_ring_matches_naive_grads(seq_mesh, rng):
    q, k, v = _qkv(rng, n=32)
    ring = get_attention_core("ring")  # default axis 'seq'
    co = jnp.asarray(rng.standard_normal(v.shape[:2] + (32, v.shape[-1])), jnp.float32)

    def loss(core, q, k, v):
        return jnp.sum(core(q, k, v) * co)

    gw = jax.grad(lambda *a: loss(xla_attention_core, *a), argnums=(0, 1, 2))(q, k, v)
    gg = jax.jit(jax.grad(lambda *a: loss(ring, *a), argnums=(0, 1, 2)))(q, k, v)
    for name, w, g in zip("qkv", gw, gg):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=2e-5,
                                   err_msg=f"d{name} mismatch")


def test_ring_fallback_paths(seq_mesh, rng):
    ring = get_attention_core("ring@seq")
    # token count not divisible by the seq axis → exact naive fallback
    q, k, v = _qkv(rng, n=30)
    np.testing.assert_array_equal(np.asarray(ring(q, k, v)),
                                  np.asarray(xla_attention_core(q, k, v)))
    # cross-attention (N != M) → fallback
    q2 = q[:, :, :16]
    np.testing.assert_array_equal(np.asarray(ring(q2, k, v)),
                                  np.asarray(xla_attention_core(q2, k, v)))


def test_ring_no_mesh_fallback(rng):
    set_attention_mesh(None)
    ring = get_attention_core("ring@seq")
    q, k, v = _qkv(rng)
    np.testing.assert_array_equal(np.asarray(ring(q, k, v)),
                                  np.asarray(xla_attention_core(q, k, v)))


def test_ring_under_jit_inside_model_scale(seq_mesh, rng):
    """The core composes under jit with sharded inputs (the production shape:
    GSPMD lays out tokens over 'seq', shard_map runs the ring body)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(rng, n=128)
    sh = NamedSharding(seq_mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    ring = get_attention_core("ring@seq")
    got = jax.jit(ring)(qs, ks, vs)
    want = xla_attention_core(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
