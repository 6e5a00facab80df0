"""Loss parity tests vs torch implementations written from the reference spec."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from cenet_tpu.train.losses import (
    Criterion,
    boundary_dou_loss,
    cross_entropy_loss,
    dice_loss,
)


def make_batch(rng, b=2, h=32, w=32, k=4):
    logits = rng.standard_normal((b, h, w, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(b, h, w)).astype(np.int64)
    return logits, labels


def torch_ce(logits_nhwc, labels):
    lt = torch.from_numpy(np.transpose(logits_nhwc, (0, 3, 1, 2)))
    return tF.cross_entropy(lt, torch.from_numpy(labels)).item()


def torch_dice(logits_nhwc, labels, k):
    probs = torch.softmax(torch.from_numpy(np.transpose(logits_nhwc, (0, 3, 1, 2))), dim=1)
    target = tF.one_hot(torch.from_numpy(labels), k).permute(0, 3, 1, 2).float()
    smooth = 1e-5
    loss = 0.0
    for i in range(k):
        inter = (probs[:, i] * target[:, i]).sum()
        y = (target[:, i] ** 2).sum()
        z = (probs[:, i] ** 2).sum()
        loss += 1 - (2 * inter + smooth) / (z + y + smooth)
    return (loss / k).item()


def torch_boundary_dou(logits_nhwc, labels, k):
    probs = torch.softmax(torch.from_numpy(np.transpose(logits_nhwc, (0, 3, 1, 2))), dim=1)
    target_all = tF.one_hot(torch.from_numpy(labels), k).permute(0, 3, 1, 2).float()
    kernel = torch.tensor([[0.0, 1, 0], [1, 1, 1], [0, 1, 0]]).view(1, 1, 3, 3)
    smooth = 1e-5
    total = 0.0
    for i in range(k):
        t = target_all[:, i]
        y = torch.conv2d(t.unsqueeze(1), kernel, padding=1).squeeze(1) * t
        y[y == 5] = 0
        c = torch.count_nonzero(y)
        s = torch.count_nonzero(t)
        alpha = 1 - (c + smooth) / (s + smooth)
        alpha = 2 * alpha - 1
        alpha = min(alpha, torch.tensor(0.8))
        inter = (probs[:, i] * t).sum()
        ysum = (t * t).sum()
        zsum = (probs[:, i] ** 2).sum()
        total += (zsum + ysum - 2 * inter + smooth) / (zsum + ysum - (1 + alpha) * inter + smooth)
    return (total / k).item()


def test_ce_matches_torch(rng):
    logits, labels = make_batch(rng)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - torch_ce(logits, labels)) < 1e-5


def test_dice_matches_torch(rng):
    logits, labels = make_batch(rng)
    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), 4))
    assert abs(ours - torch_dice(logits, labels, 4)) < 1e-5


def test_boundary_dou_matches_torch(rng):
    # structured labels so boundaries exist
    logits, _ = make_batch(rng, k=3)
    labels = np.zeros((2, 32, 32), np.int64)
    labels[:, 8:20, 8:24] = 1
    labels[:, 12:16, 12:18] = 2
    ours = float(boundary_dou_loss(jnp.asarray(logits[..., :3]), jnp.asarray(labels), 3))
    ref = torch_boundary_dou(logits[..., :3], labels, 3)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_criterion_combo(rng):
    logits, labels = make_batch(rng)
    crit = Criterion(4, "dice,ce", "0.5,0.5")
    ours = float(crit(jnp.asarray(logits), jnp.asarray(labels)))
    ref = 0.5 * torch_dice(logits, labels, 4) + 0.5 * torch_ce(logits, labels)
    assert abs(ours - ref) < 1e-5


def test_boundary_empty_class(rng):
    """Classes absent from the batch must not produce NaN (smooth terms)."""
    logits, _ = make_batch(rng, k=4)
    labels = np.zeros((2, 32, 32), np.int64)  # only class 0 present
    val = float(boundary_dou_loss(jnp.asarray(logits), jnp.asarray(labels), 4))
    assert np.isfinite(val)
