"""Image-space ops with exact PyTorch interpolation semantics.

The reference decodes logits at 4x and bilinearly upsamples with
align_corners=True/False depending on the model (reference:
networks/engines/aot_engine.py:374-379, MODEL_ALIGN_CORNERS). J&F parity
requires bit-matching those coordinates, which `jax.image.resize` does not
provide (it has no align_corners=True mode), so we implement separable
bilinear resize via gathers.

Layout convention: NHWC (channel-last) throughout.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _axis_indices_np(in_size: int, out_size: int, align_corners: bool):
    """Source indices & lerp weights for one axis (torch upsample parity).

    Pure numpy (sizes are always static): usable both for the gather
    formulation and to build dense resize matrices at trace time.
    """
    import numpy as np

    out = np.arange(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), np.float32)
        else:
            src = out * ((in_size - 1) / (out_size - 1))
    else:
        src = (out + 0.5) * (in_size / out_size) - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source coords
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0.astype(np.float32)).astype(np.float32)
    return i0, i1, w


def _axis_indices(in_size: int, out_size: int, align_corners: bool):
    i0, i1, w = _axis_indices_np(in_size, out_size, align_corners)
    return jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(w)


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w = _axis_indices(in_size, out_size, align_corners)
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape).astype(lo.dtype)
    return lo * (1 - w) + hi * w


def interpolate_bilinear(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = True
) -> jax.Array:
    """Bilinear resize of NHWC (or ...HWC) images to `size`=(H, W).

    Matches torch.nn.functional.interpolate(mode='bilinear') for both
    align_corners settings (verified against torch in tests).
    """
    h, w = int(size[0]), int(size[1])
    x = _resize_axis(x, x.ndim - 3, h, align_corners)
    x = _resize_axis(x, x.ndim - 2, w, align_corners)
    return x


def interpolate_bilinear_cf(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = True
) -> jax.Array:
    """Bilinear resize of channel-FIRST (..., H, W) arrays to `size`.

    Same coordinates as interpolate_bilinear; used by the training loss
    pipeline, which keeps logits channel-major so per-pixel loss ops
    vectorise over the (H, W) plane instead of an 11-wide minor axis.
    """
    h, w = int(size[0]), int(size[1])
    x = _resize_axis(x, x.ndim - 2, h, align_corners)
    x = _resize_axis(x, x.ndim - 1, w, align_corners)
    return x


def _resize_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (out, in) interpolation matrix for one axis — each row holds
    the two lerp weights of `_axis_indices`, so `A @ x` equals the gather
    formulation exactly (same coordinates, same clamping)."""
    import numpy as np

    i0, i1, w = _axis_indices_np(in_size, out_size, align_corners)
    a = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    a[rows, i0] += 1.0 - w
    a[rows, i1] += w
    return jnp.asarray(a)


def interpolate_bilinear_matmul_cf(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = True
) -> jax.Array:
    """Bilinear resize of channel-first (..., H, W) arrays via two dense
    matmuls: `Y = A_h @ X @ A_w^T`.

    Same coordinates as interpolate_bilinear. Preferred on TPU for
    DIFFERENTIATED resizes: the gather formulation's backward is a
    scatter-add (serialised on TPU), while this one's backward is two
    transposed matmuls on the MXU. Upsampling 117->465 is ~2.8 GFLOP per
    (8, 11) batch — noise at MXU rates.
    """
    h, w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-2], x.shape[-1]
    dt = x.dtype
    if in_h != h:
        a_h = _resize_matrix(in_h, h, align_corners).astype(dt)
        x = jnp.einsum("Hh,...hw->...Hw", a_h, x)
    if in_w != w:
        a_w = _resize_matrix(in_w, w, align_corners).astype(dt)
        x = jnp.einsum("Ww,...hw->...hW", a_w, x)
    return x


def interpolate_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC images (torch 'nearest' parity: floor(d*scale))."""
    h, w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    iy = jnp.minimum((jnp.arange(h) * (in_h / h)).astype(jnp.int32), in_h - 1)
    ix = jnp.minimum((jnp.arange(w) * (in_w / w)).astype(jnp.int32), in_w - 1)
    x = jnp.take(x, iy, axis=x.ndim - 3)
    x = jnp.take(x, ix, axis=x.ndim - 2)
    return x


def one_hot_mask(mask: jax.Array, cls_num: int) -> jax.Array:
    """(B, H, W) int mask -> (B, H, W, cls_num+1) float one-hot.

    Mirrors reference utils/image.py:69-74 (which returns NCHW; we use NHWC).
    """
    if mask.ndim == 4 and mask.shape[-1] == 1:
        mask = mask[..., 0]
    return jax.nn.one_hot(mask.astype(jnp.int32), cls_num + 1, dtype=jnp.float32)


def flip_horizontal(x: jax.Array) -> jax.Array:
    """Flip the W axis of an NHWC (or ...HWC) array."""
    return jnp.flip(x, axis=x.ndim - 2)


def pack_labels_4bit(labels: jax.Array) -> jax.Array:
    """Pack a (..., W) uint8 label map with values <= 15 to (..., ceil(W/2))
    uint8, two labels per byte (low nibble = even column). Device-side half
    of the mask downlink compression: label maps are <= (max_obj_num+1)
    valued, so shipping full bytes wastes half the mandatory device->host
    bytes on the serving link (the reference never downlinks masks — its
    GPU is host-attached, evaluator.py:444-446; this is TPU-serving-only)."""
    w = labels.shape[-1]
    if w % 2:
        pad = [(0, 0)] * (labels.ndim - 1) + [(0, 1)]
        labels = jnp.pad(labels, pad)
    lo = labels[..., 0::2].astype(jnp.uint8)
    hi = labels[..., 1::2].astype(jnp.uint8)
    return lo | (hi << 4)


def upsample_argmax(
    logits: jax.Array, size: Tuple[int, int], align_corners: bool = True
) -> jax.Array:
    """argmax(-1) of the bilinear-upsampled NHWC logits, channel-first.

    Same result as `jnp.argmax(interpolate_bilinear(logits, size), -1)`
    (the reference decode cadence, aot_engine.py:374-380 + argmax), but
    computed in (B, C, H, W): NHWC at C=11 pads the minor axis to the
    TPU's 128 lanes, so the gather-form upsample of (8, 465, 465, 11)
    moves ~11x the useful bytes and its take-along gathers serialize —
    measured 18.7 ms of a 43 ms batch-8 step. Channel-first, the resize
    is two dense matmuls on the MXU (rows have exactly two non-zeros, so
    values match the lerp formulation bit-for-bit in fp32) and the argmax
    is a cheap cross-sublane reduce; same shape costs <1 ms. Serving
    paths (step / step_videos / step_chunk) all decode through here.
    """
    xcf = jnp.moveaxis(logits, -1, -3)
    xcf = interpolate_bilinear_matmul_cf(xcf, size, align_corners)
    return jnp.argmax(xcf, axis=-3).astype(jnp.int32)


def unpack_labels_4bit_np(packed, w: int):
    """Host-side inverse of pack_labels_4bit. packed: numpy uint8 (..., P);
    returns (..., w) uint8."""
    import numpy as np

    lo = packed & 0xF
    hi = packed >> 4
    out = np.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (-1,))
    return out[..., :w]


@partial(jax.jit, static_argnames=("num_classes",))
def label_to_onehot_probs(label: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)


def generate_permute_matrix(
    key: jax.Array, dim: int, num: int, keep_first: bool = True
) -> jax.Array:
    """(num, dim, dim) batch of permutation matrices; row 0 (background)
    pinned when keep_first. TPU-side equivalent of the reference's identity
    shuffling (utils/math.py:3-25)."""
    eye = jnp.eye(dim, dtype=jnp.float32)

    def one(k):
        if keep_first:
            perm = jax.random.permutation(k, dim - 1)
            return jnp.concatenate([eye[:1], eye[1:][perm]], axis=0)
        return eye[jax.random.permutation(k, dim)]

    return jax.vmap(one)(jax.random.split(key, num))


def truncated_normal_init(key: jax.Array, shape: Sequence[int], std: float = 0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
