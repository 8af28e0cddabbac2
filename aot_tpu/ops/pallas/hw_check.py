"""On-hardware Pallas kernel numerics checks, importable by both the
regression harness (tools/tpu_hw_check.py) and bench.py — so the driver's
end-of-round bench re-verifies both kernel families on the real chip every
round instead of relying on a manually-invoked tool.

The pytest suite pins the CPU backend (tests/conftest.py); only these
checks exercise the Mosaic-compiled kernels.
"""

from __future__ import annotations

from typing import Dict, Tuple


def run_numerics_checks() -> Tuple[bool, Dict[str, float]]:
    """Run each Pallas kernel on the current default device against its jnp
    oracle. Returns (all_ok, {check_name: max_abs_err}). Call only when
    jax.default_backend() == 'tpu'."""
    import numpy as np
    import jax.numpy as jnp

    from aot_tpu.ops import attention as A
    from aot_tpu.ops.pallas.flash_mem_attn import flash_memory_attention
    from aot_tpu.ops.pallas.local_window_attn import (
        local_window_attention_flat, local_window_attention_wide)

    rng = np.random.RandomState(0)
    errs: Dict[str, float] = {}

    # flash LT-memory attention vs the XLA global-attention oracle
    b, h, d, lq, lk = 2, 8, 32, 900, 7200
    q = jnp.asarray(rng.randn(b, lq, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, lk, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, lk, h * d), jnp.float32)
    vl = jnp.asarray([lk, int(lk * 0.6)], jnp.int32)
    prev = A.set_attn_impl("xla")
    try:
        want = A.global_attention(q, k, v, h, d, valid_len=vl)
    finally:
        A.set_attn_impl(prev)
    got = flash_memory_attention(q, k, v, vl, h, d)
    errs["flash_mem_attn"] = float(jnp.max(jnp.abs(want - got)))

    # wide local-window kernel vs the banded oracle
    hgt, wid, m = 46, 80, 7
    hw = hgt * wid
    win2 = (2 * m + 1) ** 2
    ql = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    kl = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    vlo = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    rb = jnp.asarray(0.3 * rng.randn(1, h, hw, win2), jnp.float32)
    rv = jnp.asarray(0.3 * rng.randn(h, d, win2), jnp.float32)
    want = A.local_attention_banded(
        ql, kl, vlo, rb, rv, num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d)
    got = local_window_attention_wide(
        ql, kl, vlo, rb, rv, num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d)
    errs["local_window_kernel"] = float(jnp.max(jnp.abs(want - got)))

    # flat local-window kernel (the eval-grid serving path) vs the same
    # banded oracle at the AOTT 465² serving shape (30x30 grid)
    hgt, wid = 30, 30
    hw = hgt * wid
    qf = jnp.asarray(rng.randn(2, hw, h * d), jnp.float32)
    kf = jnp.asarray(rng.randn(2, hw, h * d), jnp.float32)
    vf = jnp.asarray(rng.randn(2, hw, h * d), jnp.float32)
    rbf = jnp.asarray(0.3 * rng.randn(2, h, hw, win2), jnp.float32)
    want = A.local_attention_banded(
        qf, kf, vf, rbf, rv, num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d)
    got = local_window_attention_flat(
        qf, kf, vf, rbf, rv, num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d)
    errs["local_window_flat_kernel"] = float(jnp.max(jnp.abs(want - got)))

    ok = (errs["flash_mem_attn"] < 5e-5
          and errs["local_window_kernel"] < 5e-4
          and errs["local_window_flat_kernel"] < 5e-4)
    return ok, errs
