"""Attention primitives, written TPU-first.

These are the pure-jnp implementations ("oracles"): dense matmuls that XLA
tiles straight onto the MXU, fp32 softmax, static shapes, and valid-length
masking instead of the reference's dynamically growing tensors. The Pallas
kernels in aot_tpu/ops/pallas/ are drop-in replacements for the hot paths and
are unit-tested against these functions.

Semantics reproduce the reference's kernels:
  - global memory attention  (reference: networks/layers/attention.py:29-126)
  - dilated local-window attention with relative key/value biases
    (reference: networks/layers/attention.py:248-577 — V2 correlation path
    and V3 masked-dense fallback are numerically identical; we implement the
    masked-dense form because an (HW x HW) matmul is MXU-native, while the
    reference's scatter into a padded (HW x pad^2) tensor is not)
  - gated propagation (softmax attention + elementwise gate, reference:
    networks/layers/attention.py:589-914)

Layouts: sequences are (B, L, C); images are NHWC.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _mem_len_rescale(
    q: jax.Array, valid_len, q_len: int, max_mem_len_ratio: float
) -> jax.Array:
    """Eval-time query rescale for very long memories
    (reference: attention.py:84-89). valid_len: scalar or (B,)."""
    if max_mem_len_ratio <= 0:
        return q
    ratio = jnp.asarray(valid_len, jnp.float32) / q_len
    scaling = jnp.log(ratio) / math.log(max_mem_len_ratio)
    factor = jnp.where(ratio > max_mem_len_ratio, scaling, 1.0)
    factor = factor.reshape((-1,) + (1,) * (q.ndim - 1)) if factor.ndim else factor
    return q * factor.astype(q.dtype)


def _topk_filter(scores: jax.Array, top_k: int) -> jax.Array:
    """Keep only the top_k logits per query (others -> -inf). Equivalent to
    the reference's scatter-of-top-k-softmax (attention.py:102-105) because
    softmax over the surviving set is unchanged."""
    if top_k <= 0 or top_k >= scores.shape[-1]:
        return scores
    kth = jax.lax.top_k(scores, top_k)[0][..., -1:]
    return jnp.where(scores >= kth, scores, NEG_INF)


# Attention implementation policy: 'auto' routes large ring-buffer reads to
# the Pallas flash kernel on TPU; 'xla' forces the dense oracle below.
# Set once at startup via set_attn_impl (cfg.ATTN_IMPL).
_ATTN_IMPL = "auto"
# 'auto' dispatch crossovers, MEASURED ON v5e (tools/bench_flash.py,
# tools/bench_local.py). Other TPU generations have different
# compute:bandwidth ratios — override per chip via the env vars below, the
# ATTN_* config keys (applied by build_infer_engine), or
# set_attn_thresholds(); ATTN_IMPL stays the all-or-nothing switch.
_FLASH_MIN_KEYS_BF16 = int(os.environ.get("AOT_TPU_FLASH_MIN_KEYS_BF16",
                                          4096))
_FLASH_MIN_KEYS_FP32 = int(os.environ.get("AOT_TPU_FLASH_MIN_KEYS_FP32",
                                          8192))
# max score-tensor elements before query chunking kicks in (~256 MB fp32)
_SCORE_BUDGET = 64 * 1024 * 1024


def set_attn_thresholds(flash_min_keys_bf16=None, flash_min_keys_fp32=None,
                        dense_local_max_tokens=None) -> None:
    """Override the v5e-measured 'auto' dispatch crossovers (None = keep)."""
    global _FLASH_MIN_KEYS_BF16, _FLASH_MIN_KEYS_FP32, _DENSE_LOCAL_MAX_TOKENS
    if flash_min_keys_bf16 is not None:
        _FLASH_MIN_KEYS_BF16 = int(flash_min_keys_bf16)
    if flash_min_keys_fp32 is not None:
        _FLASH_MIN_KEYS_FP32 = int(flash_min_keys_fp32)
    if dense_local_max_tokens is not None:
        _DENSE_LOCAL_MAX_TOKENS = int(dense_local_max_tokens)


def set_attn_impl(impl: str) -> str:
    """Set the dispatch mode; returns the previous mode (for restore)."""
    global _ATTN_IMPL
    prev = _ATTN_IMPL
    _ATTN_IMPL = impl
    return prev


# Trace-time flag: the training engine wraps its forward in
# attn_training_context(), so every global attention inside the TRAINING
# program routes to the differentiable flash kernel regardless of size —
# under autodiff the XLA path materialises each (B,h,Lq,Lk) fp32 score
# tensor several times in fwd AND saves it for bwd (measured 129 GB HBM
# traffic per batch-8 training forward); the fused kernel never does.
# Inference keeps the measured size thresholds (XLA wins small shapes).
_TRAINING_TRACE = False


class attn_training_context:
    def __enter__(self):
        global _TRAINING_TRACE
        self._prev = _TRAINING_TRACE
        _TRAINING_TRACE = True

    def __exit__(self, *exc):
        global _TRAINING_TRACE
        _TRAINING_TRACE = self._prev


def _use_flash(lk: int, valid_len, top_k, max_mem_len_ratio,
               dtype=None) -> bool:
    """v5e measurements at Lq=900, h=8, d_att=32 (tools/bench_flash.py,
    chained-jit timing):

      fp32  Lk=900: XLA 0.66ms / flash 0.68 · Lk=7.2k: 1.46/1.63 ·
            Lk=28.8k: 5.60/4.74 (valid 60%: 5.62/3.29 — the kernel skips
            dead k-blocks, XLA cannot)
      bf16  Lk=28.8k: XLA 5.29ms / flash 1.39 (3.8x)

    XLA wins small memories (fused dense softmax); the flash kernel wins
    once the score tensor dominates HBM traffic. 'grow'-policy rings run
    50-100% valid, which shifts the fp32 crossover to ~8k tokens.
    Under a TRAINING trace the kernel is used for every size (see
    attn_training_context)."""
    if _ATTN_IMPL in ("xla", "reference"):
        return False
    if top_k > 0 or max_mem_len_ratio > 0:
        return False
    if jax.default_backend() != "tpu" and _ATTN_IMPL != "pallas":
        return False  # jnp path is the oracle everywhere else
    if _TRAINING_TRACE or _ATTN_IMPL == "pallas":
        return True
    if valid_len is None:
        return False
    if dtype == jnp.bfloat16:
        return lk >= _FLASH_MIN_KEYS_BF16
    return lk >= _FLASH_MIN_KEYS_FP32


def global_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    d_att: Optional[int] = None,
    *,
    valid_len=None,
    top_k: int = -1,
    max_mem_len_ratio: float = -1.0,
) -> jax.Array:
    """Multi-head softmax attention over a (possibly ring-buffered) memory.

    q: (B, Lq, h*d_att)   k: (B, Lk, h*d_att)   v: (B, Lk, Cv)
    valid_len: optional int scalar — tokens of k/v beyond it are masked out
      (the ring buffer's live length). None = all valid.
    Returns (B, Lq, Cv) in v.dtype.
    """
    b, lq, cq = q.shape
    if _use_flash(k.shape[1], valid_len, top_k, max_mem_len_ratio,
                  dtype=k.dtype):
        from aot_tpu.ops.pallas.flash_attn_vjp import flash_attention

        return flash_attention(q, k, v, valid_len, num_heads, d_att)
    lk = k.shape[1]
    h = num_heads
    d = d_att if d_att is not None else cq // h

    q = q / math.sqrt(d)
    if valid_len is not None:
        q = _mem_len_rescale(q, valid_len, lq, max_mem_len_ratio)

    qh = _split_heads(q, h)
    kh = _split_heads(k, h)
    vh = _split_heads(v, h)

    def attend(qc):
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qc, kh, preferred_element_type=jnp.float32
        )
        if valid_len is not None:
            key_ids = jnp.arange(lk)[None, None, None, :]
            vl = jnp.asarray(valid_len)
            vl = vl.reshape(-1, 1, 1, 1) if vl.ndim else vl
            scores = jnp.where(key_ids < vl, scores, NEG_INF)
        scores = _topk_filter(scores, top_k)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                          preferred_element_type=jnp.float32)

    # bound the score tensor to ~_SCORE_BUDGET elements by chunking queries
    # (the reference's eval-time qk_chunks, attention.py:8-19,97,113 — here
    # automatic, as a sequential lax.map over query chunks)
    n_score = b * h * lq * lk
    if n_score > _SCORE_BUDGET and lq > 256:
        chunk = max(256, _SCORE_BUDGET // max(b * h * lk, 1))
        chunk = min(chunk, lq)
        pad = (-lq) % chunk
        qp = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        nc = qp.shape[2] // chunk
        qc = qp.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)
        out = jax.lax.map(attend, qc)  # (nc, B, h, chunk, dv)
        out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, -1)
        out = out[:, :, :lq]
    else:
        out = attend(qh)
    return _merge_heads(out).astype(v.dtype)


# ---------------------------------------------------------------------------
# Local (short-term) window attention
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def local_index_maps(
    h: int, w: int, max_dis: int, dilation: int = 1
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static index maps for an (h, w) grid and (2*max_dis+1)^2 dilated window.

    Returns numpy arrays (baked into the jaxpr as constants):
      key_of:   (HW, win2) int32 — key index for each (query, window slot),
                0 where invalid
      key_mask: (HW, win2) bool  — window slot lands inside the image
      win_of:   intentionally omitted; derived as needed
    """
    win = 2 * max_dis + 1
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    qy = ys.reshape(-1)  # (HW,)
    qx = xs.reshape(-1)
    dy, dx = np.meshgrid(
        np.arange(-max_dis, max_dis + 1) * dilation,
        np.arange(-max_dis, max_dis + 1) * dilation,
        indexing="ij",
    )
    ky = qy[:, None] + dy.reshape(-1)[None, :]  # (HW, win2)
    kx = qx[:, None] + dx.reshape(-1)[None, :]
    key_mask = (ky >= 0) & (ky < h) & (kx >= 0) & (kx < w)
    key_of = np.where(key_mask, ky * w + kx, 0).astype(np.int32)
    return key_of, key_mask.astype(bool)


@lru_cache(maxsize=32)
def dense_window_maps(h: int, w: int, max_dis: int, dilation: int = 1):
    """(HW, HW) maps for the dense-masked formulation:
      win_idx: window-slot index of key kk relative to query q (0 if outside)
      in_win:  bool — kk is inside q's window
    """
    win = 2 * max_dis + 1
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    py = ys.reshape(-1)
    px = xs.reshape(-1)
    dy = py[None, :] - py[:, None]  # key - query
    dx = px[None, :] - px[:, None]
    ok_step = ((dy % dilation) == 0) & ((dx % dilation) == 0)
    wy = dy // dilation + max_dis
    wx = dx // dilation + max_dis
    in_win = ok_step & (np.abs(dy) <= max_dis * dilation) & (np.abs(dx) <= max_dis * dilation)
    win_idx = np.where(in_win, wy * win + wx, 0).astype(np.int32)
    return win_idx, in_win.astype(bool)


def relative_emb_from_q(q: jax.Array, weight: jax.Array, bias: jax.Array,
                        num_heads: int) -> jax.Array:
    """Per-query relative key bias: grouped 1x1 conv as einsum.

    q: (B, HW, h*d_att); weight: (h, win2, d_att); bias: (h, win2)
    -> (B, h, HW, win2)
    Mirrors the reference's grouped Conv2d `relative_emb_k`
    (attention.py:276-280), applied to the *unscaled* q.
    """
    b, l, _ = q.shape
    h = num_heads
    qh = q.reshape(b, l, h, -1)
    out = jnp.einsum("blhd,hwd->bhlw", qh, weight,
                     preferred_element_type=jnp.float32)
    return out + bias[None, :, None, :]


# queries above this count switch away from the dense formulation (the
# dense (HW x HW) score tensor at full-res DAVIS would not fit in HBM):
# on TPU to the fused Pallas window kernel (v5e, fp32, chained-jit,
# tools/bench_local.py: 1080p 68x120 XLA-banded 291 ms vs kernel 28.7 ms;
# 46x80 kernel 14.4 ms; at 480p 29x29 XLA-dense 2.7 ms beats the kernel's
# 5.8 ms, so the dense path keeps small shapes), elsewhere to the banded
# jnp formulation (the oracle). v5e-measured; override via env /
# set_attn_thresholds (see above).
_DENSE_LOCAL_MAX_TOKENS = int(os.environ.get(
    "AOT_TPU_DENSE_LOCAL_MAX_TOKENS", 2500))


def _flat_kernel_fits(q, v, num_heads, size_2d, max_dis, d_att) -> bool:
    """VMEM feasibility of the flat-layout local kernel: one program holds
    q + 15 row-shifted k/v slabs + rel-bias + the (win², HW) score scratch.
    ≈ 5.9 KB/token at the AOT head shape (d=dv=32, win 15) → fits eval
    grids (900-2500 tokens) comfortably; full-res 1080p grids stay on the
    blocked wide kernel."""
    hw = size_2d[0] * size_2d[1]
    d = d_att if d_att is not None else q.shape[-1] // num_heads
    dv = v.shape[-1] // num_heads
    win = 2 * max_dis + 1
    per_tok = 4 * (d + win * (d + dv) + 2 * win * win + dv)
    return per_tok * (hw + 2 * max_dis * win) < 12 * 2**20


def _use_local_kernel() -> bool:
    if _ATTN_IMPL in ("xla", "reference"):
        return False
    if _TRAINING_TRACE:
        # the wide window kernel defines no custom VJP; a differentiated
        # trace at crops >_DENSE_LOCAL_MAX_TOKENS tokens must take the
        # banded formulation instead (the flash path handles training via
        # flash_attn_vjp; this one via fallback)
        return False
    if _ATTN_IMPL == "pallas":
        return True
    return jax.default_backend() == "tpu"


def local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    dilation: int = 1,
    d_att: Optional[int] = None,
    gate_from: Optional[jax.Array] = None,
) -> jax.Array:
    if _TRAINING_TRACE:
        # differentiated traces on TPU: the gather-free window formulation —
        # the dense/banded paths' take_along_axis backward is a serialised
        # scatter-add (74 ms fwd / 161 ms bwd at batch-8 training shapes vs
        # ~3 ms window-format; see local_attention_window). On CPU
        # (tests, the driver's virtual-mesh dryrun) the 2x(2*max_dis+1)
        # unrolled banded einsums are pure compile-time cost with no
        # scatter-add to avoid at oracle scale — take the dense path when
        # it fits; the two are numerically identical.
        if (jax.default_backend() == "tpu"
                or size_2d[0] * size_2d[1] > _DENSE_LOCAL_MAX_TOKENS):
            return local_attention_window(
                q, k, v, rel_bias, rel_v, num_heads=num_heads,
                size_2d=size_2d, max_dis=max_dis, dilation=dilation,
                d_att=d_att)
        return _local_attention_dense(
            q, k, v, rel_bias, rel_v, num_heads=num_heads, size_2d=size_2d,
            max_dis=max_dis, dilation=dilation, d_att=d_att)
    if _ATTN_IMPL == "window":
        # force the TPU serving formulation on any backend — used by the
        # cross-framework equivalence harness to exercise the exact dispatch
        # that serves on TPU while running against the CPU torch reference
        return local_attention_window(
            q, k, v, rel_bias, rel_v, num_heads=num_heads, size_2d=size_2d,
            max_dis=max_dis, dilation=dilation, d_att=d_att)
    if size_2d[0] * size_2d[1] > _DENSE_LOCAL_MAX_TOKENS and dilation == 1:
        if _use_local_kernel():
            from aot_tpu.ops.pallas.local_window_attn import (
                local_window_attention_wide)

            return local_window_attention_wide(
                q, k, v, rel_bias, rel_v, num_heads=num_heads,
                size_2d=size_2d, max_dis=max_dis, d_att=d_att)
        return local_attention_banded(
            q, k, v, rel_bias, rel_v, num_heads=num_heads, size_2d=size_2d,
            max_dis=max_dis, d_att=d_att)
    if jax.default_backend() == "tpu" and _ATTN_IMPL != "reference":
        # small sizes, TPU eval. Best: the flat-layout Pallas kernel —
        # whole image on lanes, channels on sublanes, window offsets as
        # constant diagonals (0.87 ms at B=1 / 2.46 ms at B=8 vs the
        # window form's 1.93 / 12.18 at the AOTT 465² ST shape with
        # rel_v; probe r05 tools/bench_attn_bscale.py). Its 2.8× B=1→8
        # scaling is what makes batched multi-video serving add
        # throughput. Fallbacks: gather-free window form (dilation>1,
        # VMEM-infeasible shapes, AOT_TPU_ATTN_IMPL=xla); the dense
        # form's bias gather serializes on TPU (6.7 of 9.3 ms/step, r04)
        # and stays the CPU oracle + 'reference' escape hatch.
        if (_use_local_kernel() and dilation == 1
                and _flat_kernel_fits(q, v, num_heads, size_2d, max_dis,
                                      d_att)):
            from aot_tpu.ops.pallas.local_window_attn import (
                local_window_attention_flat)

            return local_window_attention_flat(
                q, k, v, rel_bias, rel_v, num_heads=num_heads,
                size_2d=size_2d, max_dis=max_dis, d_att=d_att)
        return local_attention_window(
            q, k, v, rel_bias, rel_v, num_heads=num_heads, size_2d=size_2d,
            max_dis=max_dis, dilation=dilation, d_att=d_att)
    return _local_attention_dense(
        q, k, v, rel_bias, rel_v, num_heads=num_heads, size_2d=size_2d,
        max_dis=max_dis, dilation=dilation, d_att=d_att)


def _local_attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    dilation: int = 1,
    d_att: Optional[int] = None,
) -> jax.Array:
    """Dilated local-window attention (the short-term path).

    q, k: (B, HW, h*d_att)    v: (B, HW, Cv)
    rel_bias: (B, h, HW, win2) — output of relative_emb_from_q
    rel_v: (h, Cv//h, win2) value bias parameter, or None (gated variant)
    gate_from: unused here (gating applied by the caller); kept for parity.
    Returns (B, HW, Cv).

    Dense-masked formulation: one (HW x HW) MXU matmul + window mask +
    gathered relative bias. Numerically matches the reference's V2/V3
    (window positions outside the image receive -1e8 there ≈ hard mask here).
    """
    hgt, wid = size_2d
    hw = hgt * wid
    b = q.shape[0]
    h = num_heads
    d = d_att if d_att is not None else q.shape[-1] // h

    win_idx_np, in_win_np = dense_window_maps(hgt, wid, max_dis, dilation)
    win_idx = jnp.asarray(win_idx_np)
    in_win = jnp.asarray(in_win_np)

    qh = _split_heads(q / math.sqrt(d), h)   # (B, h, HW, d)
    kh = _split_heads(k, h)
    vh = _split_heads(v, h)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    # add the per-query relative key bias at each in-window key
    bias_dense = jnp.take_along_axis(
        rel_bias, win_idx[None, None, :, :], axis=-1
    )  # (B, h, HW, HW): rel_bias[b,h,q,win_idx[q,kk]]
    scores = jnp.where(in_win[None, None], scores + bias_dense, NEG_INF)

    attn = jax.nn.softmax(scores, axis=-1)  # fp32
    attn_c = attn.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn_c, vh,
                     preferred_element_type=jnp.float32)

    if rel_v is not None:
        # value bias: re-express attention in window coordinates (cheap gather)
        key_of_np, key_mask_np = local_index_maps(hgt, wid, max_dis, dilation)
        key_of = jnp.asarray(key_of_np)
        key_mask = jnp.asarray(key_mask_np)
        attn_win = jnp.take_along_axis(
            attn, key_of[None, None, :, :], axis=-1
        )  # (B, h, HW, win2)
        attn_win = jnp.where(key_mask[None, None], attn_win, 0.0)
        out = out + jnp.einsum(
            "bhqw,hcw->bhqc", attn_win, rel_v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    return _merge_heads(out).astype(v.dtype)


@lru_cache(maxsize=16)
def _toeplitz_onehot_np(n: int, max_dis: int):
    """(n, win, n) fp32 one-hot T[i, s, j] = 1 iff j == i + s - max_dis.
    Out-of-range rows are all-zero (the shift falls off the image edge)."""
    win = 2 * max_dis + 1
    i = np.arange(n)[:, None, None]
    s = np.arange(win)[None, :, None]
    j = np.arange(n)[None, None, :]
    return (j == i + s - max_dis).astype(np.float32)


def _local_attention_dense_mxu(
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
) -> jax.Array:
    """Dense-masked local attention with the window<->dense moves done as
    MXU matmuls — the TPU serving form (round 5).

    Same float values as _local_attention_dense (oracle): the per-query
    relative-bias placement onto dense columns is a 2D-Toeplitz map, which
    is SEPARABLE — one 1D shift along image x, one along image y — and a
    1D shift-by-row-index is a batched matmul with a tiny static one-hot
    (_toeplitz_onehot_np: (wid, win, wid), 54 KB at 480p). Matmul against
    a one-hot is exact (1.0*x accumulated once), so this is numerically
    identical to the gather form, but everything on the hot path is MXU
    work on layout-friendly shapes: the take_along_axis of the dense
    oracle serializes on TPU (6.7 ms of a 9.3 ms step), the window form's
    15 per-row-offset banded matmuls scale 10.8x from B=1->8 (10.5 ms at
    batch 8), and a pad/flatten/reshape Toeplitz variant (tried first,
    round 5) hits a Mosaic relayout cliff when its misaligned
    (..., HW, HW+win*wid) intermediate is consumed (28.7 ms at
    batch 8). This form: one (HW x HW) score matmul + four small one-hot
    matmuls. Replaces the reference's CUDA correlation sampler
    (networks/layers/attention.py:579-640).
    """
    hgt, wid = size_2d
    hw = hgt * wid
    b = q.shape[0]
    h = num_heads
    win = 2 * max_dis + 1
    d = d_att if d_att is not None else q.shape[-1] // h

    _, in_win_np = dense_window_maps(hgt, wid, max_dis, 1)
    in_win = jnp.asarray(in_win_np)
    tx = jnp.asarray(_toeplitz_onehot_np(wid, max_dis))  # (wid, win, wid)
    ty = jnp.asarray(_toeplitz_onehot_np(hgt, max_dis))  # (hgt, win, hgt)

    qh = _split_heads(q / math.sqrt(d), h)   # (B, h, HW, d)
    kh = _split_heads(k, h)
    vh = _split_heads(v, h)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)

    # scatter rel_bias (B,h,HW,win2) onto dense (B,h,HW,HW): two one-hot
    # matmuls, x-shift then y-shift; (y,x,ky,kx) flattens to (q,kk) as a
    # pure view. Off-image slots vanish (all-zero one-hot rows).
    rb6 = rel_bias.reshape(b, h, hgt, wid, win, win)
    a1 = jnp.einsum("bhyxde,xek->bhyxdk", rb6, tx, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    bias_dense = jnp.einsum("bhyxdk,ydg->bhyxgk", a1, ty, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    bias_dense = bias_dense.reshape(b, h, hw, hw)  # (y,x),(ky,kx) -> q,kk
    scores = jnp.where(in_win[None, None], scores + bias_dense, NEG_INF)

    attn = jax.nn.softmax(scores, axis=-1)  # fp32
    attn_c = attn.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn_c, vh,
                     preferred_element_type=jnp.float32)

    if rel_v is not None:
        # extract attention back to window coords with the transposed
        # one-hot matmuls (masked slots carry exactly 0 post-softmax),
        # then contract with the value bias
        a6 = attn.reshape(b, h, hgt, wid, hgt, wid)
        w1 = jnp.einsum("bhyxgk,ydg->bhyxdk", a6, ty, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        attn_win = jnp.einsum("bhyxdk,xek->bhyxde", w1, tx, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        attn_win = attn_win.reshape(b, h, hw, win * win)
        out = out + jnp.einsum(
            "bhqw,hcw->bhqc", attn_win, rel_v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    return _merge_heads(out).astype(v.dtype)


@lru_cache(maxsize=32)
def _window_valid_mask(h: int, w: int, max_dis: int, dilation: int = 1):
    """(HW, win2) bool: window slot lands inside the image (static)."""
    _, key_mask = local_index_maps(h, w, max_dis, dilation)
    return key_mask


def local_attention_window(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    rel_v: Optional[jax.Array],
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    dilation: int = 1,
    d_att: Optional[int] = None,
) -> jax.Array:
    """Window-format local attention via static spatial shifts — the
    TRAINING formulation.

    Computes scores directly as (B, h, HW, win2) with one padded-image
    slice per window offset: no (HW x HW) tensor and, crucially, NO gathers
    — the dense/banded paths re-index per-query biases with take_along_axis,
    whose backward is a serialised scatter-add on TPU (measured 74 ms fwd /
    161 ms fwd+bwd for batch-8 30x30 training shapes vs ~3 ms here). The
    relative key bias (already window-format) and the relative value bias
    apply directly; autodiff of slices/pads stays vectorised.

    Numerically identical to _local_attention_dense (oracle-tested).
    """
    hgt, wid = size_2d
    hw = hgt * wid
    b = q.shape[0]
    h = num_heads
    d = d_att if d_att is not None else q.shape[-1] // h
    dv = v.shape[-1] // h
    win = 2 * max_dis + 1
    pad = max_dis * dilation
    wp = wid + 2 * pad      # padded width

    def to_img(x, dd):
        return x.reshape(b, hw, h, dd).transpose(0, 2, 1, 3).reshape(
            b, h, hgt, wid, dd)

    q_img = to_img(q / math.sqrt(d), d)          # (B, h, H, W, d)
    k_img = to_img(k, d)
    v_img = to_img(v, dv)

    k_pad = jnp.pad(k_img, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    v_pad = jnp.pad(v_img, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))

    # Per row-offset dy: one (W x Wp) banded matmul per image row, then the
    # column band is extracted by the pad/reshape trick —
    # flat[x*(Wp+1) + dx] == full[x, x + dx] — so both the score and the
    # value walk stay MXU matmuls + static reshapes (NO gathers).
    def band_extract(full):
        # full: (..., W, Wp) -> (..., W, win) with [x, dx] = full[x, x+dx*dil]
        # via the flat-view trick: flat[x*(Wp+1) + dx*dil] == full[x, x+dx*dil]
        flat = full.reshape(full.shape[:-2] + (wid * wp,))
        flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, wid)])
        grid = flat.reshape(full.shape[:-2] + (wid, wp + 1))
        return grid[..., 0:(win - 1) * dilation + 1:dilation]

    def band_embed(band):
        # inverse of band_extract: (..., W, win) -> (..., W, Wp); interior
        # lax.pad realises the dilation stride (transposes back to the
        # strided slice above — no gather/scatter either way)
        cfg_pad = [(0, 0, 0)] * (band.ndim - 1) + [
            (0, wp + 1 - ((win - 1) * dilation + 1), dilation - 1)]
        grid = jax.lax.pad(band, jnp.zeros((), band.dtype), cfg_pad)
        flat = grid.reshape(band.shape[:-2] + (wid * (wp + 1),))
        flat = flat[..., : wid * wp]
        return flat.reshape(band.shape[:-2] + (wid, wp))

    row_scores = []
    for dy in range(win):
        k_dy = jax.lax.slice_in_dim(k_pad, dy * dilation,
                                    dy * dilation + hgt, axis=2)
        s_full = jnp.einsum("bhywd,bhyvd->bhywv", q_img, k_dy,
                            preferred_element_type=jnp.float32)
        row_scores.append(band_extract(s_full))   # (B, h, H, W, win)
    # (B, h, H, W, win_dy, win_dx) -> (B, h, HW, win2)
    scores = jnp.stack(row_scores, axis=4).reshape(b, h, hw, win * win)

    scores = scores + rel_bias  # (B, h, HW, win2), already window-format
    valid = jnp.asarray(_window_valid_mask(hgt, wid, max_dis, dilation))
    scores = jnp.where(valid[None, None], scores, NEG_INF)

    attn = jax.nn.softmax(scores, axis=-1)       # fp32
    attn_img = attn.astype(v.dtype).reshape(b, h, hgt, wid, win, win)

    out = jnp.zeros((b, h, hgt, wid, dv), jnp.float32)
    for dy in range(win):
        v_dy = jax.lax.slice_in_dim(v_pad, dy * dilation,
                                    dy * dilation + hgt, axis=2)
        a_dense = band_embed(attn_img[..., dy, :])   # (B, h, H, W, Wp)
        out = out + jnp.einsum("bhywv,bhyvd->bhywd", a_dense, v_dy,
                               preferred_element_type=jnp.float32)

    out = out.reshape(b, h, hw, dv)
    if rel_v is not None:
        out = out + jnp.einsum(
            "bhqw,hcw->bhqc", attn, rel_v.astype(jnp.float32),
            preferred_element_type=jnp.float32)
    return _merge_heads(out).astype(v.dtype)


@lru_cache(maxsize=16)
def _band_maps(h: int, w: int, rq: int, max_dis: int):
    """Maps for banded local attention with query row-bands of rq rows and
    key bands of (rq + 2*max_dis) rows. Key rows are taken from the padded
    image so every band has identical geometry.

    Returns (win_idx, in_win) of shape (rq*w, kb*w): window-slot index /
    validity for each (query-in-band, key-in-band) pair (identical for all
    bands by translation invariance; image-boundary masking comes from the
    zero-padded band contents carrying an extra valid flag).
    """
    win = 2 * max_dis + 1
    kb = rq + 2 * max_dis
    qy, qx = np.meshgrid(np.arange(rq), np.arange(w), indexing="ij")
    ky, kx = np.meshgrid(np.arange(kb), np.arange(w), indexing="ij")
    dy = ky.reshape(-1)[None, :] - (qy.reshape(-1)[:, None] + max_dis)
    dx = kx.reshape(-1)[None, :] - qx.reshape(-1)[:, None]
    in_win = (np.abs(dy) <= max_dis) & (np.abs(dx) <= max_dis)
    win_idx = np.where(in_win, (dy + max_dis) * win + (dx + max_dis), 0)

    # inverse map: band key index for each (query-in-band, window slot)
    wdy, wdx = np.meshgrid(np.arange(-max_dis, max_dis + 1),
                           np.arange(-max_dis, max_dis + 1), indexing="ij")
    kyy = (qy.reshape(-1)[:, None] + max_dis) + wdy.reshape(-1)[None, :]
    kxx = qx.reshape(-1)[:, None] + wdx.reshape(-1)[None, :]
    slot_ok = (kxx >= 0) & (kxx < w)  # rows always inside the band
    key_of = np.where(slot_ok, kyy * w + np.clip(kxx, 0, w - 1), 0)
    return (win_idx.astype(np.int32), in_win,
            key_of.astype(np.int32), slot_ok)


def local_attention_banded(
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
) -> jax.Array:
    """Banded local window attention: scores computed only against the
    (rows_per_band + 2*max_dis)-row key band around each query row-band —
    O(HW * band) memory instead of O(HW^2), enabling full-resolution eval.
    Numerically identical to the dense path (oracle-tested)."""
    hgt, wid = size_2d
    hw = hgt * wid
    b = q.shape[0]
    h = num_heads
    d = d_att if d_att is not None else q.shape[-1] // h
    dv = v.shape[-1] // h
    rq = rows_per_band
    n_bands = (hgt + rq - 1) // rq
    pad_rows = n_bands * rq - hgt
    kb = rq + 2 * max_dis

    win_idx_np, in_win_np, key_of_np, slot_ok_np = _band_maps(
        hgt, wid, rq, max_dis)
    win_idx = jnp.asarray(win_idx_np)
    in_win = jnp.asarray(in_win_np)

    def to_heads(x, dd):
        return x.reshape(b, hw, h, dd).transpose(0, 2, 1, 3)

    qh = to_heads(q / math.sqrt(d), d)      # (B, h, HW, d)
    kh = to_heads(k, d)
    vh = to_heads(v, dv)

    # pad the key/value image by max_dis rows top/bottom (+ band-alignment
    # padding at the bottom) with a valid flag
    def pad_rows_img(x, dd):
        img = x.reshape(b, h, hgt, wid, dd)
        return jnp.pad(img, ((0, 0), (0, 0),
                             (max_dis, max_dis + pad_rows), (0, 0), (0, 0)))

    k_img = pad_rows_img(kh, d)
    v_img = pad_rows_img(vh, dv)
    kv_valid = jnp.pad(jnp.ones((hgt,), bool),
                       (max_dis, max_dis + pad_rows))

    # band views: queries (nB, rq*wid, .), keys (nB, kb*wid, .)
    q_img = jnp.pad(qh.reshape(b, h, hgt, wid, d),
                    ((0, 0), (0, 0), (0, pad_rows), (0, 0), (0, 0)))
    q_bands = q_img.reshape(b, h, n_bands, rq * wid, d)
    band_starts = jnp.arange(n_bands) * rq

    def band_slice(img, dd):
        def one(s):
            return jax.lax.dynamic_slice_in_dim(img, s, kb, axis=2)
        sl = jax.vmap(one)(band_starts)          # (nB, B, h, kb, wid, dd)
        return sl.transpose(1, 2, 0, 3, 4, 5).reshape(
            b, h, n_bands, kb * wid, dd)

    k_bands = band_slice(k_img, d)
    v_bands = band_slice(v_img, dv)
    valid_bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(kv_valid, s, kb))(band_starts)
    valid_bands = jnp.repeat(valid_bands, wid, axis=1)  # (nB, kb*wid)

    scores = jnp.einsum("bhnqd,bhnkd->bhnqk", q_bands, k_bands,
                        preferred_element_type=jnp.float32)
    # per-query relative key bias, gathered into band coordinates
    rb_img = jnp.pad(
        rel_bias.reshape(b, h, hgt, wid, -1),
        ((0, 0), (0, 0), (0, pad_rows), (0, 0), (0, 0)))
    rb_bands = rb_img.reshape(b, h, n_bands, rq * wid, -1)
    bias = jnp.take_along_axis(
        rb_bands, win_idx[None, None, None, :, :], axis=-1)
    mask = in_win[None, None, None] & valid_bands[None, None, :, None, :]
    scores = jnp.where(mask, scores + bias, NEG_INF)

    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", attn.astype(v.dtype), v_bands,
                     preferred_element_type=jnp.float32)

    if rel_v is not None:
        # value bias: re-express attention in window coordinates via the
        # inverse LUT (cheap (HW, win2) gather)
        key_of = jnp.asarray(key_of_np)
        slot_ok = jnp.asarray(slot_ok_np)
        attn_win = jnp.take_along_axis(
            attn, key_of[None, None, None, :, :], axis=-1)
        attn_win = jnp.where(slot_ok[None, None, None], attn_win, 0.0)
        out = out + jnp.einsum(
            "bhnqw,hcw->bhnqc", attn_win, rel_v.astype(jnp.float32),
            preferred_element_type=jnp.float32)

    out = out.reshape(b, h, n_bands * rq * wid, dv)[:, :, :hw]
    return _merge_heads(out).astype(v.dtype)


# ---------------------------------------------------------------------------
# Gated propagation (DeAOT)
# ---------------------------------------------------------------------------


def gated_global_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    d_att: int,
    *,
    valid_len=None,
    top_k: int = -1,
    max_mem_len_ratio: float = -1.0,
) -> jax.Array:
    """DeAOT global gated propagation core: identical softmax attention but
    over a 2x-expanded value stream (reference: attention.py:636-712;
    `linear_gate` is softmax, attention.py:580-582). The U-gate, depthwise
    conv and projection are applied by the calling module."""
    return global_attention(
        q, k, v, num_heads, d_att,
        valid_len=valid_len, top_k=top_k, max_mem_len_ratio=max_mem_len_ratio,
    )


def gated_local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,
    *,
    num_heads: int,
    size_2d: Tuple[int, int],
    max_dis: int = 7,
    dilation: int = 1,
    d_att: Optional[int] = None,
) -> jax.Array:
    """DeAOT local gated propagation core (no relative value bias;
    reference: attention.py:720-914)."""
    return local_attention(
        q, k, v, rel_bias, None,
        num_heads=num_heads, size_2d=size_2d, max_dis=max_dis,
        dilation=dilation, d_att=d_att,
    )


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)
