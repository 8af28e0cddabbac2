"""Banded local attention must be numerically identical to the dense path."""

import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.ops.attention import (_local_attention_dense,
                                   local_attention_banded)


@pytest.mark.parametrize("hw", [(12, 10), (17, 9)])
@pytest.mark.parametrize("heads", [1, 2])
def test_banded_matches_dense(hw, heads):
    H, W = hw
    max_dis = 3
    win2 = (2 * max_dis + 1) ** 2
    rng = np.random.RandomState(0)
    d, dv = 4 * heads, 6 * heads
    q = rng.randn(2, H * W, d).astype(np.float32)
    k = rng.randn(2, H * W, d).astype(np.float32)
    v = rng.randn(2, H * W, dv).astype(np.float32)
    rel_bias = rng.randn(2, heads, H * W, win2).astype(np.float32) * 0.3
    rel_v = rng.randn(heads, dv // heads, win2).astype(np.float32) * 0.3

    dense = np.asarray(_local_attention_dense(
        q, k, v, jnp.asarray(rel_bias), jnp.asarray(rel_v),
        num_heads=heads, size_2d=(H, W), max_dis=max_dis))
    banded = np.asarray(local_attention_banded(
        q, k, v, jnp.asarray(rel_bias), jnp.asarray(rel_v),
        num_heads=heads, size_2d=(H, W), max_dis=max_dis, rows_per_band=4))
    np.testing.assert_allclose(banded, dense, rtol=1e-4, atol=1e-4)


def test_banded_no_rel_v():
    H, W, max_dis, heads = 11, 8, 2, 1
    rng = np.random.RandomState(1)
    q = rng.randn(1, H * W, 4).astype(np.float32)
    k = rng.randn(1, H * W, 4).astype(np.float32)
    v = rng.randn(1, H * W, 8).astype(np.float32)
    rel_bias = rng.randn(1, 1, H * W, 25).astype(np.float32)
    dense = np.asarray(_local_attention_dense(
        q, k, v, jnp.asarray(rel_bias), None, num_heads=1, size_2d=(H, W),
        max_dis=max_dis))
    banded = np.asarray(local_attention_banded(
        q, k, v, jnp.asarray(rel_bias), None, num_heads=1, size_2d=(H, W),
        max_dis=max_dis, rows_per_band=3))
    np.testing.assert_allclose(banded, dense, rtol=1e-4, atol=1e-4)
