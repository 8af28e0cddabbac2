"""Fused local-window Pallas kernel vs the jnp oracles (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aot_tpu.ops.attention import (_local_attention_dense,
                                   local_attention_banded)
from aot_tpu.ops.pallas.local_window_attn import (local_window_attention,
                                                   local_window_attention_wide)

KERNELS = {"narrow": local_window_attention, "wide": local_window_attention_wide}


def _mk(b, hgt, wid, h, d, dv, win2, with_rv, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    hw = hgt * wid
    q = rng.randn(b, hw, h * d).astype(dtype)
    k = rng.randn(b, hw, h * d).astype(dtype)
    v = rng.randn(b, hw, h * dv).astype(dtype)
    rb = (0.3 * rng.randn(b, h, hw, win2)).astype(dtype)
    rv = (0.3 * rng.randn(h, dv, win2)).astype(dtype) if with_rv else None
    return q, k, v, rb, rv


@pytest.mark.parametrize("impl", list(KERNELS))
@pytest.mark.parametrize("with_rv", [True, False])
@pytest.mark.parametrize("hgt,wid,rq", [(10, 12, 4), (9, 7, 8), (8, 8, 8)])
def test_kernel_matches_dense_oracle(hgt, wid, rq, with_rv, impl):
    h, d, dv, m = 2, 8, 8, 2
    win2 = (2 * m + 1) ** 2
    q, k, v, rb, rv = _mk(2, hgt, wid, h, d, dv, win2, with_rv)
    want = _local_attention_dense(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        None if rv is None else jnp.asarray(rv),
        num_heads=h, size_2d=(hgt, wid), max_dis=m, d_att=d)
    got = KERNELS[impl](
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        None if rv is None else jnp.asarray(rv),
        num_heads=h, size_2d=(hgt, wid), max_dis=m, d_att=d,
        rows_per_band=rq, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", list(KERNELS))
def test_kernel_matches_banded_oracle_large(impl):
    """Full-res-style shape (banded oracle is itself dense-oracle-tested)."""
    h, d, dv, m = 2, 8, 8, 3
    hgt, wid = 17, 23
    win2 = (2 * m + 1) ** 2
    q, k, v, rb, rv = _mk(1, hgt, wid, h, d, dv, win2, True, seed=3)
    want = local_attention_banded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        jnp.asarray(rv), num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d, rows_per_band=8)
    got = KERNELS[impl](
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        jnp.asarray(rv), num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d, rows_per_band=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_rv", [True, False])
@pytest.mark.parametrize("hgt,wid", [(10, 12), (9, 7), (8, 8)])
def test_flat_kernel_matches_dense_oracle(hgt, wid, with_rv):
    from aot_tpu.ops.pallas.local_window_attn import (
        local_window_attention_flat)

    h, d, dv, m = 2, 8, 8, 2
    win2 = (2 * m + 1) ** 2
    q, k, v, rb, rv = _mk(2, hgt, wid, h, d, dv, win2, with_rv)
    want = _local_attention_dense(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        None if rv is None else jnp.asarray(rv),
        num_heads=h, size_2d=(hgt, wid), max_dis=m, d_att=d)
    got = local_window_attention_flat(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rb),
        None if rv is None else jnp.asarray(rv),
        num_heads=h, size_2d=(hgt, wid), max_dis=m, d_att=d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
