"""Whole-model parity gate against the ACTUAL reference code.

The reference torch models are imported from /root/reference/src/networks (via the
test-only timm/monai stubs in tests/refstubs). Their own randomly-initialized
state_dicts are converted with ``convert/torch2jax.py`` and logits are compared on
fixed inputs. Unlike tests/test_convert.py (synthetic state dicts derived from our
key map), this closes the loop independently: a wrong key, transpose, or module
semantics anywhere in the 33M parameters fails here.

Covers: CENet flagship (Synapse config), CENetOrg, pvt_v2_b2 backbone-only, every
DSEB ``use_command`` variant incl. the DoG cross-channel-normalization quirk
(reference ``dseb.py:125-136``), and OutHead across all 4 up-block kinds × both
merge modes.
"""

import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from reference_loader import load_reference, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference checkout unavailable")

KEY = jax.random.PRNGKey(0)
TOL = 1e-4


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


def _sd_numpy(model):
    # .numpy() returns a VIEW of torch storage — copy, or a later in-place torch
    # update (BN running stats during a train forward) silently mutates the
    # "converted" values before JAX materializes them at trace time
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _convert(torch_model, variables, model_version="cenet", wrap=None):
    """Convert the torch model's state_dict into our variable tree (strict)."""
    from cenet_tpu.convert.torch2jax import convert_state_dict

    sd = _sd_numpy(torch_model)
    if wrap:  # reproduce full-model paths for standalone submodules (e.g. OutHead)
        sd = {f"{wrap}.{k}": v for k, v in sd.items()}
        variables = {coll: {wrap: tree} for coll, tree in variables.items()}
    converted, report = convert_state_dict(sd, variables, model_version=model_version, strict=True)
    if wrap:
        converted = {coll: tree[wrap] for coll, tree in converted.items()}
    return converted


def _max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# ---------------------------------------------------------------------------
# Whole-model gates (full 33M-param graphs, 224²; CPU-compile heavy → one config
# each, the flagship ones the released checkpoints use)
# ---------------------------------------------------------------------------


def test_cenet_flagship_logits_parity():
    """Synapse flagship CENet: torch reference vs converted JAX, ≤1e-4 logits."""
    torch = _torch()
    networks = load_reference()
    ref = networks.CENet(
        input_channels=1, num_classes=9, scale_factors=[0.8, 0.4],
        diffatt_num_heads=[16, 8, 8], skip_mode="cat", dec_up_block="eucb",
        out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
    ).eval()

    from cenet_tpu.models.cenet import CENet

    model = CENet(
        input_channels=1, num_classes=9, scale_factors=(0.8, 0.4),
        diffatt_num_heads=(16, 8, 8), skip_mode="cat", dec_up_block="eucb",
        out_merge_mode="cat", out_up_block="upcn", out_up_ks=3, attn_impl="xla",
    )
    x = np.random.default_rng(0).standard_normal((1, 1, 224, 224)).astype(np.float32)
    variables = model.init(KEY, jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables = _convert(ref, variables, "cenet")

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = model.apply(variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    diff = _max_abs(want, got)
    assert diff <= TOL, f"flagship CENet logits diff {diff:.2e}"


def test_cenet_org_logits_parity():
    torch = _torch()
    networks = load_reference()
    ref = networks.CENetOrg(
        input_channels=1, num_classes=9, scale_factors=[0.8, 0.4],
        num_heads=[16, 8, 8], skip_mode="cat",
    ).eval()

    from cenet_tpu.models.cenet import CENetOrg

    model = CENetOrg(
        input_channels=1, num_classes=9, scale_factors=(0.8, 0.4),
        num_heads=(16, 8, 8), skip_mode="cat", attn_impl="xla",
    )
    x = np.random.default_rng(1).standard_normal((1, 1, 224, 224)).astype(np.float32)
    variables = model.init(KEY, jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables = _convert(ref, variables, "cenet_org")

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = model.apply(variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    diff = _max_abs(want, got)
    assert diff <= TOL, f"CENetOrg logits diff {diff:.2e}"


def test_pvt_b2_backbone_parity():
    """Standalone pvt_v2_b2: 4 stage outputs ≤1e-4 (covers the encoder converter path
    used for pretrained pvt_v2_b2.pth loading)."""
    torch = _torch()
    load_reference()
    from networks.cenet.pvtv2 import pvt_v2_b2

    ref = pvt_v2_b2().eval()

    from cenet_tpu.models.pvtv2 import make_pvt

    model = make_pvt("pvt_v2_b2", attn_impl="xla", drop_path_rate=0.1)
    x = np.random.default_rng(2).standard_normal((1, 3, 224, 224)).astype(np.float32)
    variables = model.init(KEY, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    variables = _convert(ref, variables, "cenet")

    with torch.no_grad():
        want = [o.numpy() for o in ref(torch.from_numpy(x))]
    got = model.apply(variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    for i, (w, g) in enumerate(zip(want, got)):
        diff = _max_abs(w, np.asarray(g).transpose(0, 3, 1, 2))
        assert diff <= TOL, f"pvt stage {i} diff {diff:.2e}"


# ---------------------------------------------------------------------------
# Submodule gates vs the actual reference modules (cheap; cover the variant
# surface the full-model gates can't afford to compile)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["add", "cat"])
@pytest.mark.parametrize(
    "use_command",
    ["dat", "fea", "dog", "dat-fea", "dat-dog", "seq-dat-fea", "seq-dat-dog", "dat-fea-dog"],
)
def test_dseb_use_command_parity(use_command, mode):
    """Every DSEB variant vs the actual reference DSEBlock (incl. the DoG
    cross-channel kernel-normalization quirk, reference dseb.py:125-136)."""
    torch = _torch()
    load_reference()
    from networks.cenet.modules.dseb import DSEBlock as RefDSEB

    dim, hw, heads, depth = 8, 14, 2, 2
    ref = RefDSEB(
        dim=dim, scale_factors=[0.8, 0.4], num_heads=heads, input_size=hw,
        mode=mode, use_command=use_command, depth=depth,
    ).eval()

    from cenet_tpu.nn.dseb import DSEBlock

    model = DSEBlock(
        dim=dim, scale_factors=(0.8, 0.4), num_heads=heads, input_size=hw,
        mode=mode, use_command=use_command, depth=depth, attn_impl="xla",
    )
    rng = np.random.default_rng(3)
    skip = rng.standard_normal((2, dim, hw, hw)).astype(np.float32)
    dec = rng.standard_normal((2, dim, hw, hw)).astype(np.float32)
    variables = model.init(
        KEY, jax.numpy.asarray(skip.transpose(0, 2, 3, 1)), jax.numpy.asarray(dec.transpose(0, 2, 3, 1))
    )
    variables = _convert(ref, variables, "cenet")

    with torch.no_grad():
        want = ref(torch.from_numpy(skip), torch.from_numpy(dec)).numpy()
    got = model.apply(
        variables, jax.numpy.asarray(skip.transpose(0, 2, 3, 1)), jax.numpy.asarray(dec.transpose(0, 2, 3, 1))
    )
    diff = _max_abs(want, np.asarray(got).transpose(0, 3, 1, 2))
    assert diff <= 1e-5, f"DSEB[{use_command},{mode}] diff {diff:.2e}"


# ---------------------------------------------------------------------------
# Train-mode gate: forward+backward vs the actual reference (VERDICT r2 #3).
# Catches what the eval-logits gates cannot: wrong BN momentum (torch 0.1
# convention), mis-scaled λ gradients, droppath/dropout semantics.
# ---------------------------------------------------------------------------


def test_cenet_train_step_parity():
    """One fp32 training forward+backward on an identical batch: loss, the FULL
    parameter-gradient tree (λ, BN affine, convs — converted through the same
    layout map as the weights), and the post-step BN running stats must match the
    torch reference ≤ tolerance. Reference train loop: main_synapse.py:256-276;
    BN semantics: modules/cfam.py:22-32."""
    torch = _torch()
    networks = load_reference()
    ref = networks.CENet(
        input_channels=1, num_classes=4, scale_factors=[0.8, 0.4],
        diffatt_num_heads=[4, 4, 4], encoder="pvt_v2_b0", skip_mode="cat",
        dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
    )
    ref.backbone.reset_drop_path(0.0)  # droppath off → deterministic train step
    ref.train()

    from cenet_tpu.models.cenet import CENet
    from cenet_tpu.train.losses import cross_entropy_loss

    model = CENet(
        input_channels=1, num_classes=4, scale_factors=(0.8, 0.4),
        diffatt_num_heads=(4, 4, 4), encoder="pvt_v2_b0", skip_mode="cat",
        dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
        attn_impl="xla", drop_path_rate=0.0,
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 224, 224)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 224, 224))
    variables = model.init(KEY, jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables = _convert(ref, variables, "cenet")

    # ---- torch forward+backward (plain CE keeps the torch side independent of
    # our loss code; loss-fn parity is covered by the unit tests) ----
    tx = torch.from_numpy(x)
    tl = torch.from_numpy(labels).long()
    logits = ref(tx)
    loss_t = torch.nn.functional.cross_entropy(logits, tl)
    loss_t.backward()
    grad_sd = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p)).detach().numpy()
        for k, p in ref.named_parameters()
    }
    post_sd = _sd_numpy(ref)  # running_mean/var updated by the train forward

    # ---- JAX forward+backward on the converted weights ----
    import jax.numpy as jnp

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=True, deterministic=False,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return cross_entropy_loss(out.astype(jnp.float32), jnp.asarray(labels)), mut["batch_stats"]

    (loss_j, new_bs), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    assert abs(float(loss_j) - float(loss_t)) <= 1e-5 * max(1.0, abs(float(loss_t))), (
        f"loss: torch {float(loss_t):.6f} vs jax {float(loss_j):.6f}")

    # gradients: convert the torch grad 'state dict' through the SAME layout map
    # as the weights, into a zeros template (leaves without a torch counterpart
    # stay 0 on both sides)
    from cenet_tpu.convert.torch2jax import convert_state_dict

    zeros = jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["params"])
    want_tree, _ = convert_state_dict(grad_sd, {"params": zeros}, "cenet", strict=False)
    flat_want = jax.tree_util.tree_flatten_with_path(want_tree["params"])[0]
    flat_got = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
                for kp, v in jax.tree_util.tree_flatten_with_path(grads)[0]}
    n_lambda = n_bn_scale = 0
    for kp, want in flat_want:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        got = flat_got[path]
        want = np.asarray(want)
        tol = 1e-5 + 1e-3 * float(np.max(np.abs(want)))  # fp32 whole-model bwd noise floor
        diff = float(np.max(np.abs(got - want)))
        assert diff <= tol, f"grad mismatch at {'/'.join(path)}: {diff:.3e} > {tol:.3e}"
        if "lambda_" in path[-1]:
            n_lambda += 1
            assert np.max(np.abs(want)) > 0, f"torch λ grad unexpectedly zero at {path}"
    assert n_lambda >= 4  # the λ reparam gradients were really compared

    # BN running stats after the train step (torch momentum-0.1 convention)
    bs_tmpl = jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["batch_stats"])
    want_bs, _ = convert_state_dict(post_sd, {"params": variables["params"], "batch_stats": bs_tmpl},
                                    "cenet", strict=False)
    got_bs = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
              for kp, v in jax.tree_util.tree_flatten_with_path(new_bs)[0]}
    for kp, want in jax.tree_util.tree_flatten_with_path(want_bs["batch_stats"])[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        diff = float(np.max(np.abs(got_bs[path] - np.asarray(want))))
        assert diff <= 1e-4, f"BN running-stat mismatch at {'/'.join(path)}: {diff:.3e}"
        n_bn_scale += 1
    assert n_bn_scale > 0


@pytest.mark.parametrize("merge_mode", ["cat", "add"])
@pytest.mark.parametrize("up_block", ["uprb", "eucb", "upcn", "uptc"])
def test_outhead_upblock_parity(up_block, merge_mode):
    """OutHead across all 4 up-block kinds × both merge modes vs the actual
    reference OutHead (reference out.py:10-75) at reduced spatial size."""
    torch = _torch()
    load_reference()
    from networks.cenet.out import OutHead as RefOutHead

    dec_c, x_c, n_cls = 16, 1, 5
    ref = RefOutHead(
        dec_in_channels=dec_c, x_in_channels=x_c, out_channels=n_cls,
        merge_mode=merge_mode, up_block=up_block, up_ks=3,
    ).eval()

    from cenet_tpu.models.out_head import OutHead

    model = OutHead(
        dec_in_channels=dec_c, x_in_channels=x_c, out_channels=n_cls,
        merge_mode=merge_mode, up_block=up_block, up_ks=3,
    )
    rng = np.random.default_rng(4)
    dec = rng.standard_normal((2, dec_c, 28, 28)).astype(np.float32)
    x = rng.standard_normal((2, x_c, 112, 112)).astype(np.float32)
    variables = model.init(
        KEY, jax.numpy.asarray(dec.transpose(0, 2, 3, 1)), jax.numpy.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    variables = _convert(ref, variables, "cenet", wrap="out")

    with torch.no_grad():
        want = ref(torch.from_numpy(dec), torch.from_numpy(x)).numpy()
    got = model.apply(
        variables, jax.numpy.asarray(dec.transpose(0, 2, 3, 1)), jax.numpy.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    diff = _max_abs(want, np.asarray(got).transpose(0, 3, 1, 2))
    assert diff <= 1e-5, f"OutHead[{up_block},{merge_mode}] diff {diff:.2e}"


def test_cenet_org_train_step_parity():
    """CENetOrg one fp32 training forward+backward on an identical batch: loss,
    the full gradient tree (incl. λ and the DoG/SkipEnhancer path), and post-step
    BN running stats vs the actual reference ≤ tolerance. Mirrors
    test_cenet_train_step_parity for the org variant (reference
    ``networks/cenet_org/net.py``, train loop ``main_synapse.py:256-276``)."""
    torch = _torch()
    networks = load_reference()
    ref = networks.CENetOrg(
        input_channels=1, num_classes=4, scale_factors=[0.8, 0.4],
        num_heads=[4, 4, 4], encoder="pvt_v2_b0", skip_mode="cat",
    )
    ref.backbone.reset_drop_path(0.0)
    ref.train()

    from cenet_tpu.models.cenet import CENetOrg
    from cenet_tpu.train.losses import cross_entropy_loss

    model = CENetOrg(
        input_channels=1, num_classes=4, scale_factors=(0.8, 0.4),
        num_heads=(4, 4, 4), encoder="pvt_v2_b0", skip_mode="cat",
        attn_impl="xla", drop_path_rate=0.0,
    )
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 1, 224, 224)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 224, 224))
    import jax.numpy as jnp

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(KEY, xj, train=False)
    variables = _convert(ref, variables, "cenet_org")

    tx = _torch().from_numpy(x)
    tl = torch.from_numpy(labels).long()
    logits = ref(tx)
    loss_t = torch.nn.functional.cross_entropy(logits, tl)
    loss_t.backward()
    grad_sd = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p)).detach().numpy()
        for k, p in ref.named_parameters()
    }
    post_sd = _sd_numpy(ref)

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, train=True, deterministic=False,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return cross_entropy_loss(out.astype(jnp.float32), jnp.asarray(labels)), mut["batch_stats"]

    (loss_j, new_bs), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert abs(float(loss_j) - float(loss_t)) <= 1e-5 * max(1.0, abs(float(loss_t))), (
        f"loss: torch {float(loss_t):.6f} vs jax {float(loss_j):.6f}")

    from cenet_tpu.convert.torch2jax import convert_state_dict

    zeros = jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["params"])
    want_tree, _ = convert_state_dict(grad_sd, {"params": zeros}, "cenet_org", strict=False)
    flat_got = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
                for kp, v in jax.tree_util.tree_flatten_with_path(grads)[0]}
    n_lambda = 0
    for kp, want in jax.tree_util.tree_flatten_with_path(want_tree["params"])[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        want = np.asarray(want)
        # Looser absolute floor than the flagship gate (1e-5): the org variant
        # has a learned 1→3 stem whose weight grads are ~1e-5-tiny from heavy
        # cancellation through the stem BN — at that scale the measured
        # fp64-vs-fp64 torch/JAX gap (~1.3e-6 abs; both sides fp32-stable vs
        # their own fp64) from sub-parity-bar functional residue (fp32-computed
        # DoG/interp constants, max-reduce tie routing) dominates. 1e-4 still
        # fails loudly on real bugs: transpose/momentum/λ errors perturb the
        # 1e-3..1e-1-magnitude leaves far above it.
        tol = 1e-4 + 2e-3 * float(np.max(np.abs(want)))
        diff = float(np.max(np.abs(flat_got[path] - want)))
        assert diff <= tol, f"grad mismatch at {'/'.join(path)}: {diff:.3e} > {tol:.3e}"
        if "lambda_" in path[-1]:
            n_lambda += 1
    assert n_lambda >= 4

    bs_tmpl = jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["batch_stats"])
    want_bs, _ = convert_state_dict(post_sd, {"params": variables["params"], "batch_stats": bs_tmpl},
                                    "cenet_org", strict=False)
    got_bs = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
              for kp, v in jax.tree_util.tree_flatten_with_path(new_bs)[0]}
    n_bn = 0
    for kp, want in jax.tree_util.tree_flatten_with_path(want_bs["batch_stats"])[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        diff = float(np.max(np.abs(got_bs[path] - np.asarray(want))))
        assert diff <= 1e-4, f"BN running-stat mismatch at {'/'.join(path)}: {diff:.3e}"
        n_bn += 1
    assert n_bn > 0


def _torch_boundary_crit(torch, k):
    """Reference BoundaryDoULoss (``utils/core.py:83-131``) as a CPU-runnable,
    autograd-friendly torch criterion (the reference hard-codes ``.cuda()``;
    semantics verified against it in tests/test_losses.py). alpha depends only on
    the target (integer counts — exact on both sides); grads flow through the
    intersect/y_sum/z_sum DoU terms."""
    kernel = torch.tensor([[0.0, 1, 0], [1, 1, 1], [0, 1, 0]]).view(1, 1, 3, 3)
    smooth = 1e-5

    def crit(logits, labels):
        probs = torch.softmax(logits, dim=1)
        target_all = torch.nn.functional.one_hot(labels, k).permute(0, 3, 1, 2).float()
        total = 0.0
        for i in range(k):
            t = target_all[:, i]
            y = torch.conv2d(t.unsqueeze(1), kernel, padding=1).squeeze(1) * t
            y = torch.where(y == 5, torch.zeros_like(y), y)
            alpha = 1 - (torch.count_nonzero(y) + smooth) / (torch.count_nonzero(t) + smooth)
            alpha = torch.clamp(2 * alpha - 1, max=0.8)
            inter = (probs[:, i] * t).sum()
            ysum = (t * t).sum()
            zsum = (probs[:, i] ** 2).sum()
            total = total + (zsum + ysum - 2 * inter + smooth) / (zsum + ysum - (1 + alpha) * inter + smooth)
        return total / k

    return crit


@pytest.mark.parametrize("loss_type", ["ce", "boundary"])
def test_cenet_multistep_trajectory_parity(loss_type):
    """TEN lockstep optimizer steps vs the actual torch reference (VERDICT r3 #3;
    boundary variant VERDICT r4 #5 — BoundaryDoU is what Synapse/ACDC actually
    train with, ``scripts/synapse.sh`` loss 'boundary' w=1): SGD momentum 0.9 +
    weight decay + per-iteration poly schedule + evolving BN running stats,
    distinct batches per step, fp32, droppath 0. Catches schedule/momentum/
    stat-decay drift that the single-step gates cannot. Reference semantics:
    optimizer/scheduler ``utils/core.py:12-41``; BoundaryDoU ``utils/core.py:83-131``;
    per-iteration ``scheduler.step()`` ``main_synapse.py:275-276``. Bar: params
    max-abs-diff ≤ 1e-4 after 10 steps."""
    torch = _torch()
    networks = load_reference()
    ref = networks.CENet(
        input_channels=1, num_classes=4, scale_factors=[0.8, 0.4],
        diffatt_num_heads=[4, 4, 4], encoder="pvt_v2_b0", skip_mode="cat",
        dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
    )
    ref.backbone.reset_drop_path(0.0)
    ref.train()

    from cenet_tpu.models.cenet import CENet

    model = CENet(
        input_channels=1, num_classes=4, scale_factors=(0.8, 0.4),
        diffatt_num_heads=(4, 4, 4), encoder="pvt_v2_b0", skip_mode="cat",
        dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn", out_up_ks=3,
        attn_impl="xla", drop_path_rate=0.0,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    N, LR, WD = 10, 0.015, 1e-4
    batches = [
        (rng.standard_normal((2, 1, 224, 224)).astype(np.float32),
         rng.integers(0, 4, (2, 224, 224)))
        for _ in range(N)
    ]
    variables = model.init(KEY, jnp.asarray(batches[0][0].transpose(0, 2, 3, 1)), train=False)
    variables = _convert(ref, variables, "cenet")

    # ---- torch trajectory: exactly the reference loop (main_synapse.py:256-276)
    torch_crit = (
        (lambda out, lb: torch.nn.functional.cross_entropy(out, lb))
        if loss_type == "ce"
        else _torch_boundary_crit(torch, 4)
    )
    opt = torch.optim.SGD(ref.parameters(), lr=LR, weight_decay=WD, momentum=0.9)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda step: (1 - step / N) ** 0.9)
    losses_t = []
    for x, lb in batches:
        opt.zero_grad()
        loss_t = torch_crit(ref(torch.from_numpy(x)), torch.from_numpy(lb).long())
        loss_t.backward()
        opt.step()
        sched.step()
        losses_t.append(float(loss_t))

    # ---- JAX trajectory through the real Trainer (same optimizer/schedule cfg)
    from cenet_tpu.core.config import get_preset
    from cenet_tpu.train.trainer import Trainer, TrainState

    cfg = get_preset("synapse")
    cfg = cfg.replace(
        model=cfg.model.__class__(
            input_channels=1, num_classes=4, scale_factors=(0.8, 0.4),
            diffatt_num_heads=(4, 4, 4), encoder="pvt_v2_b0", skip_mode="cat",
            dec_up_block="eucb", out_merge_mode="cat", out_up_block="upcn",
            drop_path_rate=0.0, attn_impl="xla",
        ),
        train=cfg.train.__class__(
            max_epochs=1, batch_size=2, base_lr=LR, optimizer="sgd",
            scheduler="poly", loss_type=loss_type, loss_weights="1.0", amp=False,
            weight_decay=WD,
        ),
    )
    tr = Trainer(cfg, max_iterations=N)
    state = TrainState(
        variables["params"], variables["batch_stats"],
        tr.tx.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    losses_j = []
    for i, (x, lb) in enumerate(batches):
        state, loss_j = tr.train_step(
            state, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(lb), jax.random.PRNGKey(i)
        )
        losses_j.append(float(loss_j))

    for i, (lt, lj) in enumerate(zip(losses_t, losses_j)):
        assert abs(lt - lj) <= 1e-4 * max(1.0, abs(lt)), (
            f"loss diverged at step {i}: torch {lt:.6f} vs jax {lj:.6f}"
        )

    # ---- final params: convert the post-trajectory torch state dict and compare
    from cenet_tpu.convert.torch2jax import convert_state_dict

    post_sd = _sd_numpy(ref)
    tmpl = {
        "params": jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["params"]),
        "batch_stats": jax.tree.map(lambda a: np.zeros(np.shape(a), np.float32), variables["batch_stats"]),
    }
    want, _ = convert_state_dict(post_sd, tmpl, "cenet", strict=False)
    got_p = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
             for kp, v in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    worst = ("", 0.0)
    for kp, w in jax.tree_util.tree_flatten_with_path(want["params"])[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        diff = float(np.max(np.abs(got_p[path] - np.asarray(w))))
        if diff > worst[1]:
            worst = ("/".join(path), diff)
        assert diff <= 1e-4, f"param drift after {N} steps at {'/'.join(path)}: {diff:.3e}"
    # BN running stats after the full trajectory
    got_bs = {tuple(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
              for kp, v in jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]}
    for kp, w in jax.tree_util.tree_flatten_with_path(want["batch_stats"])[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        diff = float(np.max(np.abs(got_bs[path] - np.asarray(w))))
        assert diff <= 1e-4, f"BN stat drift after {N} steps at {'/'.join(path)}: {diff:.3e}"
