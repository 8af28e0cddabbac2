"""Fused local-window (short-term) attention kernel.

TPU-native replacement for the reference's V2 correlation CUDA kernel
(reference: networks/layers/attention.py:248-428): each query attends to a
(2*max_dis+1)^2 window around itself, with a per-query relative key bias and
an optional relative value bias.

Formulation: window-format scores computed by static spatial shifts of the
key/value image inside VMEM — scores exist only as an (rq*W, win2) tile, the
softmax runs over the true window axis (225 logits/query instead of the
banded XLA path's 2640-col masked rows), and nothing O(HW * band) ever
touches HBM. Grid: (batch*heads, query-row-bands).

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


def _kernel_no_rv(q_ref, k_ref, v_ref, rb_ref, o_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, rb_ref, None, o_ref, has_rv=False, **kw)


def _kernel_with_rv(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, has_rv=True, **kw)


def _kernel(q_ref, k_ref, v_ref, rb_ref, rv_ref, o_ref, *,
            rq: int, height: int, width: int, max_dis: int, scale: float,
            has_rv: bool):
    m = max_dis
    win = 2 * m + 1
    band = pl.program_id(1)
    row0 = band * rq

    q = q_ref[0].astype(jnp.float32)              # (rq, W, d)
    k = k_ref[0, 0].astype(jnp.float32)           # (kb, W+2m, d)
    v = v_ref[0, 0]                               # (kb, W+2m, dv)
    rb = rb_ref[0].astype(jnp.float32)            # (rq, W, win2)

    gy = jax.lax.broadcasted_iota(jnp.int32, (rq, width), 0) + row0
    gx = jax.lax.broadcasted_iota(jnp.int32, (rq, width), 1)

    # phase 1: window-format scores by shifted elementwise products
    scores = []
    for dy in range(win):
        ky = gy + (dy - m)
        row_ok = (ky >= 0) & (ky < height)
        for dx in range(win):
            ks = k[dy:dy + rq, dx:dx + width, :]
            s = jnp.sum(q * ks, axis=-1) * scale + rb[..., dy * win + dx]
            kx = gx + (dx - m)
            ok = row_ok & (kx >= 0) & (kx < width)
            scores.append(jnp.where(ok, s, NEG_INF))
    s_win = jnp.stack(scores, axis=-1)            # (rq, W, win2) fp32

    s_max = jnp.max(s_win, axis=-1, keepdims=True)
    p = jnp.exp(s_win - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # phase 2: output by shifted accumulation (value image walk)
    pc = p.astype(v.dtype)
    out = None
    for dy in range(win):
        for dx in range(win):
            vs = v[dy:dy + rq, dx:dx + width, :]  # (rq, W, dv)
            w_idx = dy * win + dx
            contrib = pc[:, :, w_idx:w_idx + 1] * vs
            out = contrib if out is None else out + contrib
    out = out.astype(jnp.float32)

    if has_rv:
        # relative value bias: P @ rel_v on the MXU (win2 contraction).
        # Mosaic accepts DEFAULT/HIGHEST only (the session 'high' default
        # is an XLA notion; see flash_mem_attn.py).
        rv = rv_ref[0]                            # (win2, dv)
        out = out + jax.lax.dot_general(
            p.reshape(rq * width, win * win), rv.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(rq, width, -1)

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
    rows_per_band: int = 8,
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
    rb = rel_bias.reshape(b * h, hgt, wid, win * win)
    rb = jnp.pad(rb, ((0, 0), (0, pad_q), (0, 0), (0, 0)))

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
        pl.BlockSpec((1, rq, wid, win * win), lambda bh, nb: (bh, nb, 0, 0)),
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
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*args)

    out = out[:, :hgt]                            # drop band padding
    out = out.reshape(b, h, hgt, wid, dv).transpose(0, 2, 3, 1, 4)
    return out.reshape(b, hw, h * dv)
