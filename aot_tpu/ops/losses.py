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
    flat = nll.reshape(b, num_px)
    srt = jnp.sort(flat, axis=1)[:, ::-1]  # descending
    rank = jnp.arange(num_px)[None, :]
    kept = (rank < k[..., None]) if k.ndim else (rank < k)
    return (srt * kept).sum(axis=1) / jnp.maximum(k, 1)


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
