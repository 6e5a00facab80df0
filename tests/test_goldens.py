"""Golden regression tests (SURVEY.md §4.1).

Fixed-seed inputs through key blocks and the full model; outputs pinned to stored
values. Catches unintended numerics changes in future refactors (the torch-parity
tests catch semantic errors; these catch drift). Regenerate intentionally with:

    python tests/test_goldens.py regenerate
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "goldens.npz")
KEY = jax.random.PRNGKey(42)


def _cases():
    """name → (fn producing output array)."""
    rng = np.random.default_rng(1234)

    def cenet_forward():
        from cenet_tpu.models.cenet import CENet

        m = CENet(input_channels=1, num_classes=4, diffatt_num_heads=(4, 4, 4),
                  encoder="pvt_v2_b0", drop_path_rate=0.0, attn_impl="xla")
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        v = m.init(KEY, x, train=False)
        return np.asarray(m.apply(v, x, train=False))

    def dseb_forward():
        from cenet_tpu.nn.dseb import DSEBlock

        m = DSEBlock(16, scale_factors=(0.8, 0.4), num_heads=2, input_size=8, mode="cat")
        s = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        d = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        v = m.init(KEY, s, d)
        return np.asarray(m.apply(v, s, d))

    def cfam_forward():
        from cenet_tpu.nn.cfam import CFAModule

        m = CFAModule(32, mca_rates=(1, 2, 3))
        x = jnp.asarray(rng.standard_normal((2, 14, 14, 32)), jnp.float32)
        v = m.init(KEY, x, train=False)
        return np.asarray(m.apply(v, x, train=False))

    def losses():
        from cenet_tpu.train.losses import Criterion

        logits = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 4, (2, 16, 16)), jnp.int32)
        out = []
        for lt, lw in [("boundary", "1.0"), ("dice,ce", "0.5,0.5")]:
            out.append(float(Criterion(4, lt, lw)(logits, labels)))
        return np.asarray(out)

    return {
        "cenet_forward": cenet_forward,
        "dseb_forward": dseb_forward,
        "cfam_forward": cfam_forward,
        "losses": losses,
    }


def test_goldens():
    assert os.path.exists(GOLDEN_PATH), "goldens missing — run: python tests/test_goldens.py regenerate"
    stored = np.load(GOLDEN_PATH)
    for name, fn in _cases().items():
        got = fn()
        np.testing.assert_allclose(got, stored[name], atol=1e-5, rtol=1e-4, err_msg=name)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **{k: fn() for k, fn in _cases().items()})
        print(f"wrote {GOLDEN_PATH}")
