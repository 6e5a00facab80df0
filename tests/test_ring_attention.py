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


def test_ring_routes_diff_attention(seq_mesh, rng):
    """attn_impl='ring' through the diff-attention routers (the DSEB path) must
    match the exact two-softmax decomposition — the '@seq' suffix names the SEQ
    axis, not a TP head axis (ops/flash_attention.py ring branch)."""
    from cenet_tpu.ops.flash_attention import diff_attention_interleaved

    b, h2, n, d = 2, 4, 64, 8
    q = jnp.asarray(rng.standard_normal((b, h2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h2 // 2, n, 2 * d)), jnp.float32)
    lam = jnp.float32(0.35)
    want = diff_attention_interleaved(q, k, v, lam, impl="xla")
    for impl in ("ring", "ring@seq"):
        got = diff_attention_interleaved(q, k, v, lam, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
                                   err_msg=impl)


def test_ring_full_model_448(seq_mesh, rng):
    """Whole-model integration at >224² (VERDICT r4 #4): CENet at 448² with
    DSEB/Nonlocal token dims (112²=12544) riding the ring core over the 8-way
    'seq' axis must match the chunked impl (bit-identical numerics to naive —
    full-row fp32 softmax — at O(N·chunk) memory, which is why it is the
    reference side here: the naive 12544² map would be 630 MB/head).
    Reference trigger being exercised: the >224² token dims of dseb.py:114-118."""
    from cenet_tpu.models.cenet import CENet

    kw = dict(
        input_channels=1, num_classes=2, scale_factors=(0.8, 0.4),
        diffatt_num_heads=(2, 2, 2), encoder="pvt_v2_b0", skip_mode="cat",
        dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn",
        drop_path_rate=0.0,
    )
    model_ring = CENet(attn_impl="ring", **kw)
    model_chunked = CENet(attn_impl="chunked", **kw)
    x = jnp.asarray(rng.standard_normal((1, 448, 448, 1)), jnp.float32)
    variables = model_chunked.init(jax.random.PRNGKey(0), x, train=False)
    want = model_chunked.apply(variables, x, train=False)
    got = jax.jit(lambda v, x: model_ring.apply(v, x, train=False))(variables, x)
    assert got.shape == (1, 448, 448, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


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
