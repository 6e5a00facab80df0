"""Tests for the TPU ops package (XLA fallback paths on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cenet_tpu.ops.rms_norm import rms_norm
from cenet_tpu.ops.rotary import apply_rotary_emb, make_rotary_tables


def test_rms_norm_matches_reference(rng):
    x = rng.standard_normal((4, 49, 64)).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), None, 1e-5))
    ref = x / np.sqrt(np.mean(x**2, -1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    w = rng.standard_normal((64,)).astype(np.float32)
    got_w = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    np.testing.assert_allclose(got_w, ref * w, atol=1e-5, rtol=1e-5)


def test_rms_norm_grad_matches_autodiff(rng):
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    w = rng.standard_normal((16,)).astype(np.float32) + 1.0

    def f_custom(x, w):
        return jnp.sum(jnp.square(rms_norm(x, w, 1e-5)))

    def f_plain(x, w):
        xf = x
        y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + 1e-5) * w
        return jnp.sum(jnp.square(y))

    gx1, gw1 = jax.grad(f_custom, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx2, gw2 = jax.grad(f_plain, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4, rtol=1e-4)


def test_rotary_interleaved_matches_torch_formula(rng):
    b, h, n, d = 2, 4, 8, 16
    x = rng.standard_normal((b, h, n, d)).astype(np.float32)
    cos, sin = make_rotary_tables(n, d)
    got = np.asarray(apply_rotary_emb(jnp.asarray(x), cos, sin, interleaved=True))
    # reference formula: pairs (2i, 2i+1) rotated by angle theta_i at position t
    c = np.asarray(cos)[None, None]
    s = np.asarray(sin)[None, None]
    ref = np.empty_like(x)
    ref[..., 0::2] = x[..., 0::2] * c - x[..., 1::2] * s
    ref[..., 1::2] = x[..., 1::2] * c + x[..., 0::2] * s
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_rotary_preserves_norm(rng):
    b, h, n, d = 1, 2, 16, 32
    x = rng.standard_normal((b, h, n, d)).astype(np.float32)
    cos, sin = make_rotary_tables(n, d)
    for inter in [True, False]:
        y = np.asarray(apply_rotary_emb(jnp.asarray(x), cos, sin, interleaved=inter))
        np.testing.assert_allclose(
            np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
        )


def test_pallas_attention_interpret_matches_naive(rng):
    """Pallas kernel (interpret mode on CPU) vs the naive core, incl. padding paths."""
    from cenet_tpu.nn.attention import xla_attention_core
    from cenet_tpu.ops.pallas_attention import _pallas_attention_fwd_impl

    for (b, h, n, m, d, dv) in [(2, 4, 100, 100, 16, 24), (1, 2, 196, 49, 20, 40), (1, 1, 64, 64, 8, 16)]:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        ref = xla_attention_core(q, k, v)
        got = _pallas_attention_fwd_impl(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5), (b, h, n, m, d, dv)


def test_pallas_attention_grad_path(rng):
    from cenet_tpu.ops import pallas_attention as pa

    # on CPU the custom-vjp fwd must go through interpret=False... patch impl to interpret
    q = jnp.asarray(rng.standard_normal((1, 2, 32, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 32, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 32, 16)), jnp.float32)

    from cenet_tpu.nn.attention import xla_attention_core

    g_ref = jax.grad(lambda q: jnp.sum(xla_attention_core(q, k, v) ** 2))(q)
    # bwd of pallas_attention uses the chunked core's vjp — compare directly
    from cenet_tpu.ops.flash_attention import chunked_attention_core

    g_chunk = jax.grad(lambda q: jnp.sum(chunked_attention_core(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_ref), atol=1e-5, rtol=1e-5)


def test_pallas_attention_bwd_interpret_matches_autodiff(rng):
    """Flash backward kernel (interpret) vs autodiff of the naive core."""
    from cenet_tpu.nn.attention import xla_attention_core
    from cenet_tpu.ops.pallas_attention import _pallas_attention_bwd_impl

    for (b, h, n, m, d, dv) in [(1, 2, 64, 64, 16, 16), (1, 1, 100, 49, 8, 24), (2, 2, 196, 196, 20, 40)]:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)

        def f(q, k, v):
            return jnp.sum(xla_attention_core(q, k, v) * g)

        dq_ref, dk_ref, dv_ref = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        from cenet_tpu.ops.pallas_attention import _pallas_attention_fwd_impl

        o, lse = _pallas_attention_fwd_impl(q, k, v, interpret=True, with_lse=True)
        dq, dk, dv = _pallas_attention_bwd_impl(q, k, v, o, lse, g, interpret=True)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-4, rtol=2e-4)


def test_pallas_attention_bwd_fused_interpret_matches_autodiff(rng):
    from cenet_tpu.nn.attention import xla_attention_core
    from cenet_tpu.ops.pallas_attention import (
        _pallas_attention_bwd_fused_impl,
        _pallas_attention_fwd_impl,
    )

    for (b, h, n, m, d, dv) in [(1, 2, 64, 64, 16, 16), (1, 1, 100, 49, 8, 24)]:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)

        def f(q, k, v):
            return jnp.sum(xla_attention_core(q, k, v) * g)

        dq_ref, dk_ref, dv_ref = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        o, lse = _pallas_attention_fwd_impl(q, k, v, interpret=True, with_lse=True)
        dq, dk, dv = _pallas_attention_bwd_fused_impl(q, k, v, o, lse, g, interpret=True)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-4, rtol=2e-4)


def _diff_ref(q1, k1, q2, k2, v, lam):
    from cenet_tpu.nn.attention import xla_attention_core

    return xla_attention_core(q1, k1, v) - lam * xla_attention_core(q2, k2, v)


def test_pallas_diff_attention_fwd_interpret_matches_naive(rng):
    """Fused diff-attention forward (interpret) vs two naive cores, incl. padding."""
    from cenet_tpu.ops.pallas_attention import _diff_fwd_impl

    lam = jnp.asarray(0.37, jnp.float32)
    for (b, h, n, m, d, dv) in [(2, 4, 100, 100, 4, 8), (1, 2, 196, 49, 16, 32), (1, 1, 300, 300, 8, 16)]:
        q1 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        q2 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k1 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        k2 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        ref = _diff_ref(q1, k1, q2, k2, v, lam)
        got = _diff_fwd_impl(q1, k1, q2, k2, v, lam, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pallas_diff_attention_bwd_interpret_matches_autodiff(rng):
    """Fused diff-attention backward (interpret) vs autodiff: dq1/dk1/dq2/dk2/dv/dλ."""
    from cenet_tpu.ops.pallas_attention import _diff_bwd_impl, _diff_fwd_impl

    lam = jnp.asarray(0.45, jnp.float32)
    for (b, h, n, m, d, dv) in [(1, 2, 64, 64, 4, 8), (1, 1, 100, 49, 8, 24), (2, 2, 196, 196, 4, 8)]:
        q1 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        q2 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k1 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        k2 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)

        def f(q1, k1, q2, k2, v, lam):
            return jnp.sum(_diff_ref(q1, k1, q2, k2, v, lam) * g)

        refs = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(q1, k1, q2, k2, v, lam)
        o, l1, l2 = _diff_fwd_impl(q1, k1, q2, k2, v, lam, interpret=True, with_lse=True)
        gots = _diff_bwd_impl(q1, k1, q2, k2, v, lam, o, l1, l2, g, interpret=True)
        for name, got, ref in zip(["dq1", "dk1", "dq2", "dk2", "dv", "dlam"], gots, refs):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4, err_msg=name
            )


def test_pallas_diff_attention_bwd_onekernel_matches_autodiff(rng):
    """One-kernel backward (dk/dv accumulated across q blocks) vs autodiff."""
    from cenet_tpu.ops.pallas_attention import _diff_bwd_onekernel_impl, _diff_fwd_impl

    lam = jnp.asarray(0.45, jnp.float32)
    for (b, h, n, m, d, dv) in [(1, 2, 64, 64, 4, 8), (1, 1, 100, 49, 8, 24), (2, 2, 300, 300, 4, 8)]:
        q1 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        q2 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k1 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        k2 = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)

        def f(q1, k1, q2, k2, v, lam):
            return jnp.sum(_diff_ref(q1, k1, q2, k2, v, lam) * g)

        refs = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(q1, k1, q2, k2, v, lam)
        _, l1, l2 = _diff_fwd_impl(q1, k1, q2, k2, v, lam, interpret=True, with_lse=True)
        gots = _diff_bwd_onekernel_impl(q1, k1, q2, k2, v, lam, l1, l2, g, block_q=128, interpret=True)
        for name, got, ref in zip(["dq1", "dk1", "dq2", "dk2", "dv", "dlam"], gots, refs):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4, err_msg=name
            )


def _load_negative_result(mod):
    """Load a demoted negative-result kernel module from tools/negative_results
    (VERDICT r4 #6: measured-negative Pallas kernels live outside the package
    import surface but their parity tests stay runnable)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "negative_results", f"{mod}.py")
    spec = importlib.util.spec_from_file_location(f"negative_results_{mod}", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_pallas_depthwise_fwd_interpret_matches_lax(rng):
    dwmod = _load_negative_result("depthwise")
    _lax_depthwise, _pallas_depthwise_fwd = dwmod._lax_depthwise, dwmod._pallas_depthwise_fwd

    for (shape, dil) in [((2, 16, 16, 8), 1), ((1, 14, 14, 20), 2), ((2, 9, 11, 5), 3)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, shape[-1])), jnp.float32)
        ref = _lax_depthwise(x, w, dil)
        got = _pallas_depthwise_fwd(x, w, dil, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pallas_depthwise_bwd_interpret_matches_autodiff(rng):
    dwmod = _load_negative_result("depthwise")
    _lax_depthwise, _pallas_depthwise_dw, _pallas_depthwise_fwd = (
        dwmod._lax_depthwise, dwmod._pallas_depthwise_dw, dwmod._pallas_depthwise_fwd)

    for (shape, dil) in [((2, 12, 12, 8), 1), ((1, 14, 10, 20), 2)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, shape[-1])), jnp.float32)
        g = jnp.asarray(rng.standard_normal(shape), jnp.float32)

        def f(x, w):
            return jnp.sum(_lax_depthwise(x, w, dil) * g)

        dx_ref, dw_ref = jax.grad(f, argnums=(0, 1))(x, w)
        c = shape[-1]
        wf = jnp.flip(jnp.flip(w.reshape(3, 3, c), 0), 1)
        dx = _pallas_depthwise_fwd(g, wf, dil, interpret=True)
        dw = _pallas_depthwise_dw(x, g, dil, interpret=True).reshape(w.shape)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=2e-4, rtol=2e-4)


def test_pallas_smallc_conv_fwd_interpret_matches_lax(rng):
    scmod = _load_negative_result("smallc_conv")
    _lax_conv, _pallas_conv_fwd = scmod._lax_conv, scmod._pallas_conv_fwd

    for (shape, k, cout) in [((2, 16, 16, 8), 5, 16), ((1, 20, 20, 1), 5, 32), ((2, 12, 10, 32), 3, 32)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, shape[-1], cout)), jnp.float32)
        ref = _lax_conv(x, w, k // 2)
        got = _pallas_conv_fwd(x, w, k // 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_smallc_conv_bwd_interpret_matches_autodiff(rng):
    """Fused one-kernel (dx, dw) vs autodiff of the lax conv."""
    scmod = _load_negative_result("smallc_conv")
    _lax_conv, _pallas_conv_bwd = scmod._lax_conv, scmod._pallas_conv_bwd

    for (shape, k, cout) in [((2, 12, 12, 8), 5, 16), ((1, 10, 14, 1), 3, 8), ((2, 16, 16, 64), 3, 64)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, shape[-1], cout)), jnp.float32)
        g = jnp.asarray(rng.standard_normal(shape[:3] + (cout,)), jnp.float32)

        def f(x, w):
            return jnp.sum(_lax_conv(x, w, k // 2) * g)

        dx_ref, dw_ref = jax.grad(f, argnums=(0, 1))(x, w)
        dx, dw = _pallas_conv_bwd(x, w, g, k // 2, interpret=True)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=3e-4, rtol=3e-4)


def test_pallas_diff_attention_interleaved_matches_autodiff(rng):
    """Interleaved-pair kernel ((2, bq, d) blocks, dq/dk written interleaved) vs
    autodiff of the naive composition — fwd, dq, dk, dv, dλ."""
    from cenet_tpu.ops.pallas_attention import _diff_bwd_pair_impl, _diff_fwd_pair_impl

    lam = jnp.asarray(0.45, jnp.float32)
    # n=64: bq==n (divisor path, no padding); n=100: bq=256 fallback (padded rows)
    for (b, h, n, m, d, dv) in [(1, 2, 64, 64, 4, 8), (1, 1, 100, 49, 8, 16), (2, 2, 196, 196, 4, 8)]:
        q = jnp.asarray(rng.standard_normal((b, 2 * h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, 2 * h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, dv)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)

        def f(q, k, v, lam):
            return jnp.sum(_diff_ref(q[:, 0::2], k[:, 0::2], q[:, 1::2], k[:, 1::2], v, lam) * g)

        refs = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, lam)
        o, l1, l2 = _diff_fwd_pair_impl(q, k, v, lam, interpret=True, with_lse=True)
        ref_o = _diff_ref(q[:, 0::2], k[:, 0::2], q[:, 1::2], k[:, 1::2], v, lam)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o), atol=2e-5, rtol=2e-5)
        gots = _diff_bwd_pair_impl(q, k, v, lam, l1, l2, g, interpret=True)
        for name, got, ref in zip(["dq", "dk", "dv", "dlam"], gots, refs):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4, err_msg=name
            )


def test_diff_attention_interleaved_router_matches_core(rng):
    """diff_attention_interleaved (chunked/xla fallback path on CPU) equals the
    sliced diff_attention_core composition."""
    from cenet_tpu.ops.flash_attention import diff_attention_core, diff_attention_interleaved

    lam = jnp.asarray(0.3, jnp.float32)
    b, h, n, d, dv = 2, 2, 80, 4, 8
    q = jnp.asarray(rng.standard_normal((b, 2 * h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, 2 * h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, dv)), jnp.float32)
    want = diff_attention_core(q[:, 0::2], k[:, 0::2], q[:, 1::2], k[:, 1::2], v, lam, impl="chunked")
    got = diff_attention_interleaved(q, k, v, lam, impl="chunked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
