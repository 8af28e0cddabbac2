"""Differentiable flash attention (forward + backward Pallas kernels).

Training previously ran self/long-term attention on the XLA path, which
materialises every (B, h, Lq, Lk) fp32 score tensor in HBM several times
(mask select, bias, softmax passes, AV) — measured 129 GB of HBM traffic
per training forward at batch 8 (the dominant cost; see PERFORMANCE.md).
This module streams K/V blocks through VMEM with an online softmax in the
forward (saving only the per-row logsumexp) and recomputes probabilities
blockwise in the backward — the standard flash-attention VJP:

  D  = rowsum(dO * O)
  P  = exp(S - LSE)
  dV = P^T dO
  dS = P * (dO V^T - D)
  dQ = scale * dS K        dK = scale * dS^T Q

Per-sample valid-length masking (the LT ring's live prefix) is honoured in
both directions; dead key blocks are skipped in the forward and contribute
exact zeros in the backward. The jnp path in ops.attention.global_attention
remains the correctness oracle (tests/test_flash_vjp.py compares values AND
gradients in interpret mode).

Reference hot spot being replaced: networks/layers/attention.py:29-126
driven by aot_engine.py's per-frame propagation (training backward included).
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


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


# --------------------------------------------------------------------------
# forward (online softmax; also emits LSE for the backward)
# --------------------------------------------------------------------------


def _fwd_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, block_k, scale):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[b]

    @pl.when(ki * block_k < valid)
    def _attend():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        p_ = _prec(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_) * scale
        key_idx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < valid, s, NEG_INF)

        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)
        m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:]
        lsafe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / lsafe).astype(o_ref.dtype)
        # rows with no live keys keep LSE = NEG_INF -> backward p == 0
        lse_ref[0] = jnp.where(
            l == 0.0, NEG_INF, m_ref[:] + jnp.log(lsafe))


# --------------------------------------------------------------------------
# backward: dQ (grid over k-blocks, accumulating per q-block)
# --------------------------------------------------------------------------


def _bwd_dq_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                   dq_ref, acc_ref, *, block_k, scale):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[b]

    @pl.when(ki * block_k < valid)
    def _accum():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        p_ = _prec(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_) * scale
        key_idx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < valid, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])                       # (bq, bk)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)
        ds = p * (dp - dd_ref[0])                         # (bq, bk)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


# --------------------------------------------------------------------------
# backward: dK, dV (grid over q-blocks, accumulating per k-block)
# --------------------------------------------------------------------------


def _bwd_dkv_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, block_k, scale):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    valid = valid_ref[b]

    @pl.when(ki * block_k < valid)
    def _accum():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        p_ = _prec(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_) * scale
        key_idx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < valid, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])                       # (bq, bk)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(v.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)
        ds = p * (dp - dd_ref[0])                         # (bq, bk)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p_)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# host-side plumbing
# --------------------------------------------------------------------------


def _to_heads(x, b, l, h, d):
    return x.reshape(b, l, h, d).transpose(0, 2, 1, 3).reshape(b * h, l, d)


def _from_heads(x, b, l, h, d):
    return x.reshape(b, h, l, d).transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _pad_axis1(x, mult):
    p = (-x.shape[1]) % mult
    return jnp.pad(x, ((0, 0), (0, p), (0, 0))) if p else x


def _flash_fwd_raw(qh, kh, vh, valid_bh, *, scale, block_q, block_k,
                   interpret):
    bh, lqp, d = qh.shape
    lkp = kh.shape[1]
    dv = vh.shape[-1]
    nq, nk = lqp // block_q, lkp // block_k
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, qi, ki, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, qi, ki, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_k, dv), lambda b, qi, ki, _v: (b, ki, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dv), lambda b, qi, ki, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, _v: (b, qi, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lqp, dv), vh.dtype),
            jax.ShapeDtypeStruct((bh, lqp, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(valid_bh, qh, kh, vh)
    return out, lse


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_heads(qh, kh, vh, valid_bh, scale, block_q, block_k, interpret):
    """Head-major flash attention: qh (BH, Lq, d), kh/vh (BH, Lk, d/dv),
    valid_bh (BH,) int32 live key counts."""
    out, _ = _flash_fwd_raw(qh, kh, vh, valid_bh, scale=scale,
                            block_q=block_q, block_k=block_k,
                            interpret=interpret)
    return out


def _flash_heads_fwd(qh, kh, vh, valid_bh, scale, block_q, block_k,
                     interpret):
    out, lse = _flash_fwd_raw(qh, kh, vh, valid_bh, scale=scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret)
    return out, (qh, kh, vh, valid_bh, out, lse)


def _flash_heads_bwd(scale, block_q, block_k, interpret, res, dout):
    qh, kh, vh, valid_bh, out, lse = res
    bh, lqp, d = qh.shape
    lkp = kh.shape[1]
    dv = vh.shape[-1]
    nq, nk = lqp // block_q, lkp // block_k

    # D = rowsum(dO * O) — tiny elementwise reduce, fp32
    dd = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, qi, ki, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, qi, ki, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_k, dv), lambda b, qi, ki, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_q, dv), lambda b, qi, ki, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, _v: (b, qi, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda b, qi, ki, _v: (b, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, d), qh.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(valid_bh, qh, kh, vh, dout, lse, dd)

    dk, dv_ = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nk, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, ki, qi, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, ki, qi, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_k, dv), lambda b, ki, qi, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_q, dv), lambda b, ki, qi, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, ki, qi, _v: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, ki, qi, _v: (b, qi, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda b, ki, qi, _v: (b, ki, 0)),
                pl.BlockSpec((1, block_k, dv), lambda b, ki, qi, _v: (b, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lkp, d), kh.dtype),
            jax.ShapeDtypeStruct((bh, lkp, dv), vh.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(valid_bh, qh, kh, vh, dout, lse, dd)

    return dq, dk, dv_, None


_flash_heads.defvjp(_flash_heads_fwd, _flash_heads_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: Optional[jax.Array],
    num_heads: int,
    d_att: Optional[int] = None,
    *,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable drop-in for global_attention's core (no top_k /
    mem-ratio): q (B, Lq, h*d), k (B, Lk, h*d), v (B, Lk, Cv),
    valid_len None or (B,)/scalar int. Returns (B, Lq, Cv) in v.dtype."""
    b, lq, cq = q.shape
    lk = k.shape[1]
    cv = v.shape[-1]
    h = num_heads
    d = d_att if d_att is not None else cq // h
    dv = cv // h
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, max(128, 1 << (lq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (lk - 1).bit_length()))

    qh = _pad_axis1(_to_heads(q, b, lq, h, d), bq)
    kh = _pad_axis1(_to_heads(k, b, lk, h, d), bk)
    vh = _pad_axis1(_to_heads(v, b, lk, h, dv), bk)

    if valid_len is None:
        vl = jnp.full((b,), lk, jnp.int32)
    else:
        vl = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32).reshape(-1),
                              (b,))
    valid_bh = jnp.repeat(vl, h)

    out = _flash_heads(qh, kh, vh, valid_bh, scale, bq, bk, interpret)
    return _from_heads(out[:, :lq], b, lq, h, dv)
