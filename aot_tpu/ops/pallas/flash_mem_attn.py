"""Flash-style attention over the long-term memory ring buffer.

Replaces the XLA path for the growing-memory attention (reference hot spot:
Q x [mem] with token count growing linearly in memorised frames,
aot_engine.py:291-305 / attention.py:97-121): never materialises the
(heads, Lq, Lk) score tensor; streams K/V blocks through VMEM with an
online-softmax accumulator and per-sample valid-length masking (the ring
buffer's live token count).

Forward-only: the engine uses it for inference; training keeps the XLA path
(short memories, full fusion by the compiler).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, block_q, block_k, scale):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[b]

    # skip k-blocks that are entirely beyond the live ring-buffer prefix —
    # they contribute nothing to the online softmax (all keys masked)
    @pl.when(ki * block_k < valid)
    def _attend():
        q = q_ref[0]  # (block_q, d)
        k = k_ref[0]  # (block_k, d)
        v = v_ref[0]  # (block_k, dv)

        # Mosaic supports DEFAULT/HIGHEST only (the session-level 'high'
        # default for fp32 matmuls is an XLA notion). HIGHEST on bf16
        # operands is rejected ("Bad lhs type") — bf16 runs MXU-native with
        # DEFAULT.
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec) * scale  # (block_q, block_k)

        key_idx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], k.shape[0]), 1)
        s = jnp.where(key_idx < valid, s, NEG_INF)

        m_prev = m_ref[:]          # (block_q, 1)
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)     # (block_q, block_k)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        acc = acc_ref[:] * alpha
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        m_ref[:] = m_new
        l_ref[:] = l_new
        acc_ref[:] = acc

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> 0 output
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "d_att", "block_q", "block_k", "interpret"))
def flash_memory_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: jax.Array,
    num_heads: int,
    d_att: Optional[int] = None,
    *,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """q: (B, Lq, h*d); k: (B, Lk, h*d); v: (B, Lk, Cv);
    valid_len: (B,) int32 live-token counts. Returns (B, Lq, Cv).

    Matches ops.attention.global_attention(..., valid_len=...) (without
    top_k / mem-len rescale, which stay on the XLA path).
    """
    b, lq, cq = q.shape
    lk = k.shape[1]
    cv = v.shape[-1]
    h = num_heads
    d = d_att if d_att is not None else cq // h
    dv = cv // h
    scale = 1.0 / math.sqrt(d)

    # head-major layouts
    qh = q.reshape(b, lq, h, d).transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kh = k.reshape(b, lk, h, d).transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vh = v.reshape(b, lk, h, dv).transpose(0, 2, 1, 3).reshape(b * h, lk, dv)

    # pad to block multiples (padding keys are masked by valid_len)
    pq = (-lq) % block_q
    pk = (-lk) % block_k
    if pq:
        qh = jnp.pad(qh, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kh = jnp.pad(kh, ((0, 0), (0, pk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, pk), (0, 0)))
    nq = qh.shape[1] // block_q
    nk = kh.shape[1] // block_k

    valid_bh = jnp.repeat(valid_len.astype(jnp.int32), h)

    grid = (b * h, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, _v: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, _v: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, dv), lambda bh, qi, ki, _v: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dv),
                                   lambda bh, qi, ki, _v: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, dv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq * block_q, dv), v.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(valid_bh, qh, kh, vh)

    out = out[:, :lq].reshape(b, h, lq, dv).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, cv)
