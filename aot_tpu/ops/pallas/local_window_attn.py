"""Fused local-window (short-term) attention kernel.

TPU-native replacement for the reference's V2 correlation CUDA kernel
(reference: networks/layers/attention.py:248-428): each query attends to a
(2*max_dis+1)^2 window around itself, with a per-query relative key bias and
an optional relative value bias.

Formulation: window-format scores computed by spatial shifts of the
key/value band inside VMEM — scores live in a (win2, rq, W) VMEM scratch
(the banded XLA path materialises O(HW * band_width) masked-dense scores in
HBM and gathers the bias, which measures ~280 ms at 1080p shapes; this
kernel keeps everything on-chip). The softmax runs over the true window
axis (225 logits/query instead of 2640 masked columns).

Grid: (batch*heads, query-row-bands). The window-row walk (dy) is a
lax.fori_loop and only the 15 column shifts (dx) are unrolled: a fully
unrolled 225-slot walk allocates every shifted temporary on the Mosaic
VMEM stack simultaneously (84 MB against the 16 MB scoped limit — hard
compile error on v5e). The loop bounds the live set to one window row.
rel_bias is fed pre-transposed to (BH, win2, rows, W) so the per-slot read
indexes an untiled leading dim instead of rotating the lane axis.

The relative value bias folds into the value walk: out[q] =
sum_w p[q,w] * (v[shift_w(q)] + rel_v[:, w]), so no transpose or second
matmul is needed.

The jnp oracles (ops.attention._local_attention_dense /
local_attention_banded) remain the reference semantics; this kernel is
unit-tested against them (tests/test_local_window_kernel.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel_no_rv(q_ref, k_ref, v_ref, rb_ref, o_ref, s_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, rb_ref, None, o_ref, s_ref, **kw)


def _kernel_with_rv(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw)


def _kernel(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, *,
            rq: int, height: int, width: int, max_dis: int, scale: float):
    m = max_dis
    win = 2 * m + 1
    band = pl.program_id(1)
    row0 = band * rq

    q = q_ref[0].astype(jnp.float32)              # (rq, W, d)
    gy = jax.lax.broadcasted_iota(jnp.int32, (rq, width), 0) + row0
    gx = jax.lax.broadcasted_iota(jnp.int32, (rq, width), 1)

    # phase 1: window-format scores, one window ROW per loop step (the dx
    # shifts are static lane-dim slices; dy walks the band rows dynamically)
    def score_row(dy, _):
        krows = k_ref[0, 0, pl.ds(dy, rq), :, :].astype(jnp.float32)
        ky = gy + (dy - m)
        row_ok = (ky >= 0) & (ky < height)
        for dx in range(win):
            w_idx = dy * win + dx
            ks = krows[:, dx:dx + width, :]
            rbw = rb_ref[0, pl.ds(w_idx, 1), 0, :, :][0]
            s = jnp.sum(q * ks, axis=-1) * scale + rbw
            kx = gx + (dx - m)
            ok = row_ok & (kx >= 0) & (kx < width)
            s_ref[pl.ds(w_idx, 1), :, :] = jnp.where(ok, s, NEG_INF)[None]
        return _

    jax.lax.fori_loop(0, win, score_row, 0, unroll=False)

    # softmax over the window axis (leading scratch dim)
    s = s_ref[...]
    s_max = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - s_max)
    s_ref[...] = p / jnp.sum(p, axis=0, keepdims=True)

    # phase 2: output by shifted value accumulation; the relative value
    # bias (constant per slot) rides along inside the same FMA
    def value_row(dy, acc):
        vrows = v_ref[0, 0, pl.ds(dy, rq), :, :].astype(jnp.float32)
        for dx in range(win):
            w_idx = dy * win + dx
            vs = vrows[:, dx:dx + width, :]
            if rv_ref is not None:
                rvv = rv_ref[0, pl.ds(w_idx, 1), :]
                vs = vs + rvv[None]               # (1, 1, dv) broadcast
            pw = s_ref[pl.ds(w_idx, 1), :, :]
            acc = acc + pw[0][:, :, None] * vs
        return acc

    out = jax.lax.fori_loop(
        0, win, value_row,
        jnp.zeros((rq, width, o_ref.shape[-1]), jnp.float32), unroll=False)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "size_2d", "max_dis", "d_att",
                     "rows_per_band", "interpret"))
def local_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    d_att: Optional[int] = None,
    rows_per_band: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Matches ops.attention.local_attention semantics at dilation=1.

    q, k: (B, HW, h*d)   v: (B, HW, h*dv)
    rel_bias: (B, h, HW, win2)   rel_v: (h, dv, win2) or None
    Returns (B, HW, h*dv) in v.dtype.
    """
    hgt, wid = size_2d
    hw = hgt * wid
    b, _, cq = q.shape
    h = num_heads
    d = d_att if d_att is not None else cq // h
    dv = v.shape[-1] // h
    m = max_dis
    win = 2 * m + 1
    rq = min(rows_per_band, hgt)
    n_bands = -(-hgt // rq)
    pad_q = n_bands * rq - hgt

    def to_img(x, dd):
        # (B, HW, h*dd) -> (B*h, H, W, dd)
        x = x.reshape(b, hgt, wid, h, dd).transpose(0, 3, 1, 2, 4)
        return x.reshape(b * h, hgt, wid, dd)

    q_img = jnp.pad(to_img(q, d), ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kv_pad = ((0, 0), (m, m + pad_q), (m, m), (0, 0))
    k_img = jnp.pad(to_img(k, d), kv_pad)
    v_img = jnp.pad(to_img(v, dv), kv_pad)
    # (BH, win2, nB, rq, W): the kernel reads one (rq, W) slab per window
    # slot — win2 on an untiled leading dim, band axis explicit so the
    # block covers the (rq, W) tail exactly (valid for any rq)
    rb = rel_bias.reshape(b * h, hgt, wid, win * win)
    rb = jnp.pad(rb, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    rb = rb.transpose(0, 3, 1, 2).reshape(
        b * h, win * win, n_bands, rq, wid)

    # materialise per-band key/value slices outside the kernel (overlapping
    # bands can't be expressed as BlockSpec tiles; this also lets Pallas
    # double-buffer the band DMAs). kb/rq ~ 2.75x replication of the small
    # k/v images — negligible next to the scores the kernel never spills.
    kb = rq + 2 * m
    band_starts = jnp.arange(n_bands) * rq

    def to_bands(img):
        def one(s):
            return jax.lax.dynamic_slice_in_dim(img, s, kb, axis=1)
        sl = jax.vmap(one)(band_starts)           # (nB, BH, kb, wp, dd)
        return sl.transpose(1, 0, 2, 3, 4)        # (BH, nB, kb, wp, dd)

    k_bands = to_bands(k_img)
    v_bands = to_bands(v_img)

    wp = wid + 2 * m
    in_specs = [
        pl.BlockSpec((1, rq, wid, d), lambda bh, nb: (bh, nb, 0, 0)),
        pl.BlockSpec((1, 1, kb, wp, d), lambda bh, nb: (bh, nb, 0, 0, 0)),
        pl.BlockSpec((1, 1, kb, wp, dv), lambda bh, nb: (bh, nb, 0, 0, 0)),
        pl.BlockSpec((1, win * win, 1, rq, wid),
                     lambda bh, nb: (bh, 0, nb, 0, 0)),
    ]
    args = [q_img, k_bands, v_bands, rb]
    has_rv = rel_v is not None
    if has_rv:
        # (h, dv, win2) -> (h, win2, dv); block picks the head via bh % h
        rv = jnp.transpose(rel_v, (0, 2, 1))
        in_specs.append(
            pl.BlockSpec((1, win * win, dv), lambda bh, nb: (bh % h, 0, 0)))
        args.append(rv)

    kernel = _kernel_with_rv if has_rv else _kernel_no_rv
    out = pl.pallas_call(
        functools.partial(kernel, rq=rq, height=hgt, width=wid,
                          max_dis=m, scale=1.0 / math.sqrt(d)),
        grid=(b * h, n_bands),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rq, wid, dv), lambda bh, nb: (bh, nb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_bands * rq, wid, dv),
                                       v.dtype),
        scratch_shapes=[pltpu.VMEM((win * win, rq, wid), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*args)

    out = out[:, :hgt]                            # drop band padding
    out = out.reshape(b, h, hgt, wid, dv).transpose(0, 2, 3, 1, 4)
    return out.reshape(b, hw, h * dv)


# ---------------------------------------------------------------------------
# "wide" layout variant: width on lanes, channels on sublanes.
#
# The kernel above keeps tensors as (rows, W, d) — with d=32 that uses 32 of
# 128 lanes (25%) for every elementwise op, and the per-slot probability
# broadcast p[:, :, None] relayouts (rq, W) on every one of the 225 window
# slots. This variant lays everything out as (rows, channels, W): the score
# reduction is a sublane reduce with keepdims (its (rq, 1, W) result is
# exactly the layout the value walk multiplies by — no relayouts anywhere),
# and W~120 fills the lane dim. Same math, same oracle tests.
# ---------------------------------------------------------------------------


def _kernel_wide_no_rv(q_ref, k_ref, v_ref, rb_ref, o_ref, s_ref, **kw):
    _kernel_wide(q_ref, k_ref, v_ref, rb_ref, None, o_ref, s_ref, **kw)


def _kernel_wide_rv(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw):
    _kernel_wide(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw)


def _kernel_wide(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, *,
                 rq: int, height: int, width: int, max_dis: int,
                 scale: float):
    m = max_dis
    win = 2 * m + 1
    band = pl.program_id(1)
    row0 = band * rq

    q = q_ref[0, 0].astype(jnp.float32)           # (rq, d, W)
    gy = jax.lax.broadcasted_iota(jnp.int32, (rq, 1, width), 0) + row0
    gx = jax.lax.broadcasted_iota(jnp.int32, (rq, 1, width), 2)

    def score_row(dy, _):
        krows = k_ref[0, 0, pl.ds(dy, rq), :, :].astype(jnp.float32)
        ky = gy + (dy - m)
        row_ok = (ky >= 0) & (ky < height)
        for dx in range(win):
            w_idx = dy * win + dx
            ks = krows[:, :, dx:dx + width]
            s = jnp.sum(q * ks, axis=1, keepdims=True) * scale  # (rq, 1, W)
            s = s + rb_ref[0, pl.ds(w_idx, 1), 0, :, :, :][0]
            kx = gx + (dx - m)
            ok = row_ok & (kx >= 0) & (kx < width)
            s_ref[pl.ds(w_idx, 1)] = jnp.where(ok, s, NEG_INF)[None]
        return _

    jax.lax.fori_loop(0, win, score_row, 0, unroll=False)

    s = s_ref[...]                                # (win2, rq, 1, W)
    s_max = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - s_max)
    s_ref[...] = p / jnp.sum(p, axis=0, keepdims=True)

    def value_row(dy, acc):
        vrows = v_ref[0, 0, pl.ds(dy, rq), :, :].astype(jnp.float32)
        for dx in range(win):
            w_idx = dy * win + dx
            vs = vrows[:, :, dx:dx + width]       # (rq, dv, W)
            if rv_ref is not None:
                # rv is fed as (h, win_dy, dv, win_dx): dy lands on an
                # untiled dim (dynamic index OK) and dx is a static lane
                # slice — a dynamic LANE index would need 128-alignment
                rvv = rv_ref[0, pl.ds(dy, 1), :, dx:dx + 1][0]
                vs = vs + rvv[None]               # (1, dv, 1) lane-splat
            pw = s_ref[pl.ds(w_idx, 1)][0]        # (rq, 1, W)
            acc = acc + pw * vs
        return acc

    out = jax.lax.fori_loop(
        0, win, value_row,
        jnp.zeros((rq, o_ref.shape[-2], width), jnp.float32), unroll=False)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "size_2d", "max_dis", "d_att",
                     "rows_per_band", "interpret"))
def local_window_attention_wide(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    d_att: Optional[int] = None,
    rows_per_band: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Same semantics/signature as local_window_attention (wide layout)."""
    hgt, wid = size_2d
    hw = hgt * wid
    b, _, cq = q.shape
    h = num_heads
    d = d_att if d_att is not None else cq // h
    dv = v.shape[-1] // h
    m = max_dis
    win = 2 * m + 1
    rq = min(rows_per_band, hgt)
    n_bands = -(-hgt // rq)
    pad_q = n_bands * rq - hgt

    def to_img_cw(x, dd):
        # (B, HW, h*dd) -> (B*h, rows, dd, W)
        x = x.reshape(b, hgt, wid, h, dd).transpose(0, 3, 1, 4, 2)
        return x.reshape(b * h, hgt, dd, wid)

    q_img = jnp.pad(to_img_cw(q, d), ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    q_img = q_img.reshape(b * h, n_bands, rq, d, wid)
    kv_pad = ((0, 0), (m, m + pad_q), (0, 0), (m, m))
    k_img = jnp.pad(to_img_cw(k, d), kv_pad)
    v_img = jnp.pad(to_img_cw(v, dv), kv_pad)

    rb = rel_bias.reshape(b * h, hgt, wid, win * win)
    rb = jnp.pad(rb, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    rb = rb.transpose(0, 3, 1, 2).reshape(
        b * h, win * win, n_bands, rq, 1, wid)

    kb = rq + 2 * m
    band_starts = jnp.arange(n_bands) * rq

    def to_bands(img):
        def one(s):
            return jax.lax.dynamic_slice_in_dim(img, s, kb, axis=1)
        sl = jax.vmap(one)(band_starts)           # (nB, BH, kb, dd, wp)
        return sl.transpose(1, 0, 2, 3, 4)        # (BH, nB, kb, dd, wp)

    k_bands = to_bands(k_img)
    v_bands = to_bands(v_img)

    wp = wid + 2 * m
    in_specs = [
        pl.BlockSpec((1, 1, rq, d, wid), lambda bh, nb: (bh, nb, 0, 0, 0)),
        pl.BlockSpec((1, 1, kb, d, wp), lambda bh, nb: (bh, nb, 0, 0, 0)),
        pl.BlockSpec((1, 1, kb, dv, wp), lambda bh, nb: (bh, nb, 0, 0, 0)),
        pl.BlockSpec((1, win * win, 1, rq, 1, wid),
                     lambda bh, nb: (bh, 0, nb, 0, 0, 0)),
    ]
    args = [q_img, k_bands, v_bands, rb]
    has_rv = rel_v is not None
    if has_rv:
        # (h, dv, win2) -> (h, win_dy, dv, win_dx); see kernel comment
        rv = rel_v.reshape(h, dv, win, win).transpose(0, 2, 1, 3)
        in_specs.append(
            pl.BlockSpec((1, win, dv, win), lambda bh, nb: (bh % h, 0, 0, 0)))
        args.append(rv)

    kernel = _kernel_wide_rv if has_rv else _kernel_wide_no_rv
    out = pl.pallas_call(
        functools.partial(kernel, rq=rq, height=hgt, width=wid,
                          max_dis=m, scale=1.0 / math.sqrt(d)),
        grid=(b * h, n_bands),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rq, dv, wid),
                               lambda bh, nb: (bh, nb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_bands, rq, dv, wid),
                                       v.dtype),
        scratch_shapes=[pltpu.VMEM((win * win, rq, 1, wid), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*args)

    out = out.reshape(b, h, n_bands * rq, dv, wid)[:, :, :hgt]
    out = out.transpose(0, 2, 4, 1, 3)            # (B, rows, W, h, dv)
    return out.reshape(b, hw, h * dv)


# ---------------------------------------------------------------------------
# "flat" layout variant: the whole image on lanes, channels on sublanes.
#
# At eval grids (480p -> 30x30 = 900 tokens) the wide kernel's lane dim is
# W=30 — 23% of the 128 lanes — and each of its 225 window slots touches a
# (rq, d, 30) sliver, so the kernel runs ~15x off its VPU bound (1.7 ms at
# B=1, 12.9 ms at B=8; probed r05). In FLAT HW coordinates every window
# offset is a constant diagonal: key(q, (dy,dx)) = q + (dy-m)*W + (dx-m).
# Laying tensors out as (channels, HW) makes each slot ONE full-width
# (d, 900) elementwise FMA + sublane reduce: the dy walk indexes 15
# row-shifted key/value slabs prepared on the host (contiguous pad+slice),
# the dx walk is 15 static lane slices, the softmax is a 225-sublane
# reduce, and the relative value bias is a single (dv,225)@(225,HW) MXU
# matmul. No (HW x HW) tensor, no gathers, full lane occupancy.
#
# Same semantics as local_attention at dilation=1 (oracle-tested).
# ---------------------------------------------------------------------------


def _kernel_flat_no_rv(q_ref, k_ref, v_ref, rb_ref, o_ref, s_ref, **kw):
    _kernel_flat(q_ref, k_ref, v_ref, rb_ref, None, o_ref, s_ref, **kw)


def _kernel_flat_rv(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw):
    _kernel_flat(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, **kw)


def _kernel_flat(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, s_ref, *,
                 height: int, width: int, max_dis: int, scale: float):
    m = max_dis
    win = 2 * m + 1
    hw = height * width

    q = q_ref[0].astype(jnp.float32) * scale          # (d, HW)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    x = pos % width
    y = pos // width

    # phase 1: scores — one full-width FMA + sublane reduce per slot
    def score_row(dy, _):
        krows = k_ref[0, dy].astype(jnp.float32)      # (d, HW + 2m)
        ky = y + (dy - m)
        row_ok = (ky >= 0) & (ky < height)
        for dx in range(win):
            w_idx = dy * win + dx
            ks = krows[:, dx:dx + hw]
            s = jnp.sum(q * ks, axis=0, keepdims=True)        # (1, HW)
            s = s + rb_ref[0, pl.ds(w_idx, 1), :]
            kx = x + (dx - m)
            ok = row_ok & (kx >= 0) & (kx < width)
            s_ref[pl.ds(w_idx, 1), :] = jnp.where(ok, s, NEG_INF)
        return _

    jax.lax.fori_loop(0, win, score_row, 0, unroll=False)

    # softmax over the window axis (sublane dim of the scratch)
    s = s_ref[...]                                    # (win2, HW)
    s_max = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - s_max)
    s_ref[...] = p / jnp.sum(p, axis=0, keepdims=True)

    # phase 2: value walk — masked slots carry exactly 0 probability
    def value_row(dy, acc):
        vrows = v_ref[0, dy].astype(jnp.float32)      # (dv, HW + 2m)
        for dx in range(win):
            w_idx = dy * win + dx
            pw = s_ref[pl.ds(w_idx, 1), :]            # (1, HW) sublane-splat
            acc = acc + pw * vrows[:, dx:dx + hw]
        return acc

    out = jax.lax.fori_loop(
        0, win, value_row,
        jnp.zeros((o_ref.shape[-2], hw), jnp.float32), unroll=False)

    if rv_ref is not None:
        # relative value bias: one MXU matmul against the window probs.
        # Mosaic only lowers DEFAULT/HIGHEST precisions (the session-level
        # 'high' fp32 default is an XLA notion) — both operands are fp32
        # here, so HIGHEST is exact and supported.
        out = out + jnp.dot(rv_ref[0].astype(jnp.float32), s_ref[...],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "size_2d", "max_dis", "d_att", "interpret"))
def local_window_attention_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    d_att: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Same semantics/signature as local_window_attention (flat layout).

    Grid: one program per (batch*head). VMEM per program at the AOTT eval
    shape (900 tokens, d=dv=32): 15-row k/v slabs 2x1.75 MB + rel_bias
    0.81 MB + score scratch 0.81 MB — comfortably within the 16 MB budget
    up to dv=64 (-L models).
    """
    hgt, wid = size_2d
    hw = hgt * wid
    b, _, cq = q.shape
    h = num_heads
    d = d_att if d_att is not None else cq // h
    dv = v.shape[-1] // h
    m = max_dis
    win = 2 * m + 1

    def to_flat(t, dd):
        # (B, HW, h*dd) -> (B*h, dd, HW)
        t = t.reshape(b, hw, h, dd).transpose(0, 2, 3, 1)
        return t.reshape(b * h, dd, hw)

    q_t = to_flat(q, d)
    # 15 row-shifted, lane-padded key/value slabs: slab[dy][:, j] =
    # img_flat[j + (dy-m)*W + (dx-m)] after the in-kernel dx slice — all
    # 15 are contiguous slices of ONE zero-padded flat image
    def to_slabs(t, dd):
        flat = to_flat(t, dd)
        big = jnp.pad(flat, ((0, 0), (0, 0), (m * wid + m, m * wid + m)))
        slabs = [jax.lax.slice_in_dim(big, dy * wid, dy * wid + hw + 2 * m,
                                      axis=2) for dy in range(win)]
        return jnp.stack(slabs, axis=1)               # (BH, win, dd, HW+2m)

    k_slab = to_slabs(k, d)
    v_slab = to_slabs(v, dv)
    rb_t = rel_bias.transpose(0, 1, 3, 2).reshape(b * h, win * win, hw)

    in_specs = [
        pl.BlockSpec((1, d, hw), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, win, d, hw + 2 * m), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, win, dv, hw + 2 * m), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, win * win, hw), lambda i: (i, 0, 0)),
    ]
    args = [q_t, k_slab, v_slab, rb_t]
    has_rv = rel_v is not None
    if has_rv:
        in_specs.append(
            pl.BlockSpec((1, dv, win * win), lambda i: (i % h, 0, 0)))
        args.append(rel_v)

    kernel = _kernel_flat_rv if has_rv else _kernel_flat_no_rv
    out = pl.pallas_call(
        functools.partial(kernel, height=hgt, width=wid, max_dis=m,
                          scale=1.0 / math.sqrt(d)),
        grid=(b * h,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, dv, hw), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, dv, hw), v.dtype),
        scratch_shapes=[pltpu.VMEM((win * win, hw), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(*args)

    # (BH, dv, HW) -> (B, HW, h*dv)
    out = out.reshape(b, h, dv, hw).transpose(0, 3, 1, 2)
    return out.reshape(b, hw, h * dv)
