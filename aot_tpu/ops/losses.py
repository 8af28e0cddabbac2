"""Segmentation losses (reference: networks/layers/loss.py).

Static-shape reformulations:
  - top-k hard-pixel-mining CE: the reference's torch.topk with a
    step-dependent k (loss.py:173-183) becomes sort + rank mask (k stays a
    traced scalar, shapes stay static).
  - soft Jaccard (tversky a=b=1, loss.py:28-54,118-137): the reference skips
    classes with no fg pixels via Python control flow; here a presence mask
    weights the per-class losses.

All losses take NHWC logits (B, H, W, C) and integer labels (B, H, W) with
ignore_index=255, and return per-sample (B,) losses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE = 255


def topk_sum(values: jax.Array, k: jax.Array) -> jax.Array:
    """Exact per-row sum of the k largest entries of a non-negative (B, N)
    array, without sorting.

    torch.topk (reference loss.py:179) maps to a full XLA sort on TPU
    (~4 ms forward / ~16 ms with backward for 8x216k rows). Instead, find
    the k-th largest value by bisection on the IEEE-754 bit pattern
    (monotone for non-negative floats; 32 fused compare+count passes), then

        sum_topk = sum(v * (v > t)) + (k - count(v > t)) * t

    which equals the sorted top-k sum exactly, ties included. The gradient
    flows through the elementwise sum term only — identical to topk's
    subgradient except at threshold ties (one pixel's worth).
    """
    b, _ = values.shape
    k = jnp.broadcast_to(jnp.asarray(k, jnp.int32), (b,))
    v = jax.lax.stop_gradient(values)
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    bits = jnp.maximum(bits, 0)  # -0.0 -> +0.0 bit pattern

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo + 1) // 2
        ge = (bits >= mid[:, None]).sum(axis=1) >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid - 1)

    lo0 = jnp.zeros((b,), jnp.int32)
    hi0 = jnp.full((b,), jnp.int32(0x7F7FFFFF))  # max finite float32
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    t = jax.lax.bitcast_convert_type(lo, jnp.float32)[:, None]
    n_above = (v > t).sum(axis=1)
    above_sum = jnp.sum(jnp.where(v > t, values, 0.0), axis=1)
    return above_sum + (k - n_above) * t[:, 0]


def _class_mask(logits: jax.Array, obj_nums: jax.Array) -> jax.Array:
    """Valid-class mask (B, 1, 1, C): classes 0..obj_num."""
    c = logits.shape[-1]
    ids = jnp.arange(c)[None, None, None, :]
    return ids <= obj_nums[:, None, None, None]


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    obj_nums: jax.Array,
    *,
    top_k_percent: Optional[float] = None,
    top_k_ratio: jax.Array = 1.0,
) -> jax.Array:
    """Per-sample CE with optional top-k hard mining.

    top_k_ratio in [0, 1] ramps the kept fraction from 1.0 down to
    top_k_percent (reference ramps k from all pixels to 15% over
    hard_example_mining_step steps, loss.py:173-183).
    """
    b, h, w, c = logits.shape
    logits = logits.astype(jnp.float32)
    valid_cls = _class_mask(logits, obj_nums)
    logits = jnp.where(valid_cls, logits, -1e30)

    valid_px = labels != IGNORE
    lab = jnp.where(valid_px, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid_px, nll, 0.0)

    if top_k_percent is None:
        denom = jnp.maximum(valid_px.sum(axis=(1, 2)), 1)
        return nll.sum(axis=(1, 2)) / denom

    num_px = h * w
    keep_frac = top_k_ratio * top_k_percent + (1.0 - top_k_ratio)
    k = jnp.floor(keep_frac * num_px).astype(jnp.int32)
    return topk_sum(nll.reshape(b, num_px), k) / jnp.maximum(k, 1)


def soft_jaccard_loss(
    logits: jax.Array,
    labels: jax.Array,
    obj_nums: jax.Array,
) -> jax.Array:
    """Per-sample soft Jaccard (tversky alpha=beta=1), averaged over classes
    present in the ground truth (reference: loss.py:28-54,118-137)."""
    b, h, w, c = logits.shape
    logits = logits.astype(jnp.float32)
    valid_cls = _class_mask(logits, obj_nums)
    logits = jnp.where(valid_cls, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)

    valid_px = (labels != IGNORE)[..., None]
    fg = jax.nn.one_hot(jnp.where(valid_px[..., 0], labels, IGNORE), c,
                        dtype=jnp.float32)  # ignore rows one-hot to nothing
    p = jnp.where(valid_px, probs, 0.0)

    inter = (p * fg).sum(axis=(1, 2))            # (B, C)
    p_sum = p.sum(axis=(1, 2))
    g_sum = fg.sum(axis=(1, 2))
    # tversky(1,1): inter / (inter + (p_sum - inter) + (g_sum - inter))
    denom = p_sum + g_sum - inter
    loss_c = 1.0 - inter / (denom + 1e-6)
    present = (g_sum > 0) & valid_cls[:, 0, 0, :]
    n_present = jnp.maximum(present.sum(axis=1), 1)
    return (loss_c * present).sum(axis=1) / n_present


def combined_vos_loss(
    logits: jax.Array,
    labels: jax.Array,
    obj_nums: jax.Array,
    *,
    top_k_percent: float = 0.15,
    top_k_ratio: jax.Array = 1.0,
    bce_weight: float = 0.5,
    iou_weight: float = 0.5,
) -> jax.Array:
    """0.5 * top-k CE + 0.5 * soft Jaccard (reference: aot_engine.py:113-120).
    Returns per-sample (B,) loss."""
    ce = cross_entropy_loss(
        logits, labels, obj_nums,
        top_k_percent=top_k_percent, top_k_ratio=top_k_ratio)
    jac = soft_jaccard_loss(logits, labels, obj_nums)
    return bce_weight * ce + iou_weight * jac


def combined_vos_loss_cf(
    logits: jax.Array,
    labels: jax.Array,
    obj_nums: jax.Array,
    *,
    top_k_percent: float = 0.15,
    top_k_ratio: jax.Array = 1.0,
    bce_weight: float = 0.5,
    iou_weight: float = 0.5,
) -> jax.Array:
    """Channel-FIRST (B, C, H, W) combined loss — same math as
    combined_vos_loss, laid out for the TPU's (8, 128) vector registers.

    The NHWC formulation reduces over an 11-wide minor axis (C=MAX_OBJ+1),
    wasting 117/128 lanes per op (~21 ms for the 465^2 log_softmax alone);
    channel-first vectorises every per-pixel op over the (H, W) plane and
    shares one softmax between the CE and Jaccard terms. Returns (B,).
    """
    b, c, h, w = logits.shape
    logits = logits.astype(jnp.float32)
    ids = jnp.arange(c)
    valid_cls = ids[None, :] <= obj_nums[:, None]  # (B, C)
    x = jnp.where(valid_cls[:, :, None, None], logits, -1e30)

    m = jnp.max(x, axis=1)  # (B, H, W)
    sumexp = jnp.sum(jnp.exp(x - m[:, None]), axis=1)
    lse = m + jnp.log(sumexp)

    valid_px = labels != IGNORE
    lab = jnp.where(valid_px, labels, 0).astype(jnp.int32)
    onehot = lab[:, None] == ids[None, :, None, None]  # (B, C, H, W) bool
    x_lab = jnp.sum(jnp.where(onehot, x, 0.0), axis=1)
    nll = jnp.where(valid_px, lse - x_lab, 0.0)

    keep_frac = top_k_ratio * top_k_percent + (1.0 - top_k_ratio)
    k = jnp.floor(keep_frac * (h * w)).astype(jnp.int32)
    ce = topk_sum(nll.reshape(b, h * w), k) / jnp.maximum(k, 1)

    # soft Jaccard on the shared softmax (reference loss.py:28-54,118-137)
    p = jnp.exp(x - lse[:, None])
    p = jnp.where(valid_px[:, None], p, 0.0)
    fg = onehot & valid_px[:, None]
    inter = jnp.sum(jnp.where(fg, p, 0.0), axis=(2, 3))  # (B, C)
    p_sum = jnp.sum(p, axis=(2, 3))
    g_sum = jnp.sum(fg, axis=(2, 3)).astype(jnp.float32)
    denom = p_sum + g_sum - inter
    loss_c = 1.0 - inter / (denom + 1e-6)
    present = (g_sum > 0) & valid_cls
    n_present = jnp.maximum(present.sum(axis=1), 1)
    jac = (loss_c * present).sum(axis=1) / n_present

    return bce_weight * ce + iou_weight * jac


def mean_iou(pred: jax.Array, target: jax.Array, obj_nums: jax.Array,
             max_obj_num: int = 10, epsilon: float = 1e-6) -> jax.Array:
    """Training-time monitoring IoU (reference: utils/metric.py:4-36):
    mean over fg objects, then over batch samples that have objects."""
    c = max_obj_num + 1
    ids = jnp.arange(1, c)[None, :, None, None]
    p = (pred[:, None] == ids)
    t = (target[:, None] == ids)
    inter = (p & t).sum(axis=(2, 3)).astype(jnp.float32)
    union = (p | t).sum(axis=(2, 3)).astype(jnp.float32)
    iou = (inter + epsilon) / (union + epsilon)
    valid = jnp.arange(1, c)[None, :] <= obj_nums[:, None]
    per_sample = (iou * valid).sum(1) / jnp.maximum(valid.sum(1), 1)
    has_obj = obj_nums > 0
    return jnp.where(
        has_obj.any(),
        (per_sample * has_obj).sum() / jnp.maximum(has_obj.sum(), 1),
        1.0)
