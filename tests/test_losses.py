"""Loss parity vs straightforward torch/numpy oracles."""

import numpy as np
import pytest

from aot_tpu.ops.losses import (combined_vos_loss, cross_entropy_loss,
                                mean_iou, soft_jaccard_loss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _data(seed=0, b=2, h=12, w=10, c=5, ignore_frac=0.1):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, c).astype(np.float32)
    labels = rng.randint(0, 3, size=(b, h, w)).astype(np.int32)
    ign = rng.rand(b, h, w) < ignore_frac
    labels = np.where(ign, 255, labels)
    obj_nums = np.array([2, 2], np.int32)
    return logits, labels, obj_nums


def test_plain_ce_matches_torch():
    logits, labels, obj_nums = _data()
    got = np.asarray(cross_entropy_loss(logits, labels, obj_nums))
    for b in range(2):
        t = F.cross_entropy(
            torch.from_numpy(logits[b].transpose(2, 0, 1))[None, :3],
            torch.from_numpy(labels[b].astype(np.int64))[None],
            ignore_index=255, reduction="mean")
        np.testing.assert_allclose(got[b], t.item(), rtol=1e-5, atol=1e-6)


def test_topk_ce_matches_torch():
    logits, labels, obj_nums = _data(seed=1, ignore_frac=0.0)
    ratio = 0.6  # step/hard_mining ramp position
    top_k_percent = 0.15
    got = np.asarray(cross_entropy_loss(
        logits, labels, obj_nums, top_k_percent=top_k_percent,
        top_k_ratio=ratio))
    # torch oracle (reference CE semantics, loss.py:161-184)
    h, w = labels.shape[1:]
    num_px = h * w
    k = int((ratio * top_k_percent + (1 - ratio)) * num_px)
    for b in range(2):
        px = F.cross_entropy(
            torch.from_numpy(logits[b].transpose(2, 0, 1))[None, :3],
            torch.from_numpy(labels[b].astype(np.int64))[None],
            ignore_index=255, reduction="none").view(1, -1)
        topk, _ = torch.topk(px, k=k, dim=1)
        np.testing.assert_allclose(got[b], topk.mean().item(),
                                   rtol=1e-4, atol=1e-5)


def test_soft_jaccard_matches_reference_formula():
    logits, labels, obj_nums = _data(seed=2)
    got = np.asarray(soft_jaccard_loss(logits, labels, obj_nums))
    for b in range(2):
        # tversky(alpha=beta=1) over present classes (loss.py:28-54)
        lab = labels[b].reshape(-1)
        valid = lab != 255
        lg = logits[b].reshape(-1, 5)[:, :3]
        probs = np.exp(lg) / np.exp(lg).sum(-1, keepdims=True)
        probs = probs[valid]
        lab = lab[valid]
        losses = []
        for c in range(3):
            fg = (lab == c).astype(np.float64)
            if fg.sum() == 0:
                continue
            p0 = probs[:, c].astype(np.float64)
            inter = (p0 * fg).sum()
            denom = inter + (p0 * (1 - fg)).sum() + ((1 - p0) * fg).sum()
            losses.append(1 - inter / (denom + 1e-6))
        np.testing.assert_allclose(got[b], np.mean(losses), rtol=1e-4,
                                   atol=1e-5)


def test_combined_loss_weighting():
    logits, labels, obj_nums = _data(seed=3)
    ce = np.asarray(cross_entropy_loss(logits, labels, obj_nums,
                                       top_k_percent=0.15, top_k_ratio=1.0))
    jac = np.asarray(soft_jaccard_loss(logits, labels, obj_nums))
    both = np.asarray(combined_vos_loss(logits, labels, obj_nums,
                                        top_k_ratio=1.0))
    np.testing.assert_allclose(both, 0.5 * ce + 0.5 * jac, rtol=1e-6)


def test_mean_iou_matches_reference():
    rng = np.random.RandomState(4)
    pred = rng.randint(0, 3, size=(2, 8, 8)).astype(np.int32)
    target = rng.randint(0, 3, size=(2, 8, 8)).astype(np.int32)
    obj_nums = np.array([2, 2], np.int32)
    got = float(mean_iou(pred, target, obj_nums))
    # reference pytorch_iou (utils/metric.py:4-36)
    per_sample = []
    for b in range(2):
        ious = []
        for o in (1, 2):
            p = pred[b] == o
            t = target[b] == o
            inter = (p & t).sum()
            union = (p | t).sum()
            ious.append((inter + 1e-6) / (union + 1e-6))
        per_sample.append(np.mean(ious))
    np.testing.assert_allclose(got, np.mean(per_sample), rtol=1e-5)


def test_topk_sum_exact_vs_sort():
    """Bit-bisection top-k sum == sorted top-k sum, ties included."""
    from aot_tpu.ops.losses import topk_sum

    rng = np.random.RandomState(7)
    # duplicate values force ties at the threshold
    vals = rng.randint(0, 50, size=(3, 4096)).astype(np.float32) / 7.0
    vals[1, :100] = vals[1, 0]  # heavy tie block
    vals[2] = 0.0  # all-zero row
    for k in (1, 7, 613, 4095, 4096):
        got = np.asarray(topk_sum(vals, np.int32(k)))
        want = np.sort(vals, axis=1)[:, ::-1][:, :k].sum(axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_combined_loss_cf_matches_nhwc():
    """Channel-first training-loss path == the NHWC reference formulation."""
    from aot_tpu.ops.losses import combined_vos_loss_cf

    logits, labels, obj_nums = _data(seed=3, ignore_frac=0.15)
    for ratio in (0.0, 0.37, 1.0):
        want = np.asarray(combined_vos_loss(
            logits, labels, obj_nums,
            top_k_percent=0.15, top_k_ratio=ratio))
        got = np.asarray(combined_vos_loss_cf(
            np.transpose(logits, (0, 3, 1, 2)), labels, obj_nums,
            top_k_percent=0.15, top_k_ratio=ratio))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_interpolate_bilinear_cf_matches_nhwc():
    from aot_tpu.ops.image import interpolate_bilinear, interpolate_bilinear_cf

    rng = np.random.RandomState(11)
    x = rng.randn(2, 13, 17, 5).astype(np.float32)
    for ac in (True, False):
        want = np.asarray(interpolate_bilinear(x, (52, 68), align_corners=ac))
        got = np.asarray(interpolate_bilinear_cf(
            np.transpose(x, (0, 3, 1, 2)), (52, 68), align_corners=ac))
        np.testing.assert_allclose(
            got, np.transpose(want, (0, 3, 1, 2)), rtol=1e-5, atol=1e-6)


def test_interpolate_bilinear_matmul_cf_matches_gather():
    from aot_tpu.ops.image import (
        interpolate_bilinear_cf,
        interpolate_bilinear_matmul_cf,
    )

    rng = np.random.RandomState(12)
    x = rng.randn(2, 5, 13, 17).astype(np.float32)
    for ac in (True, False):
        for out in ((52, 68), (7, 9)):  # up and down
            want = np.asarray(interpolate_bilinear_cf(x, out, align_corners=ac))
            got = np.asarray(
                interpolate_bilinear_matmul_cf(x, out, align_corners=ac))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
