"""Pallas flash memory-attention vs the jnp oracle (interpret mode on CPU;
the same test runs compiled on real TPU via bench/perf scripts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.ops.attention import global_attention
from aot_tpu.ops.pallas.flash_mem_attn import flash_memory_attention


@pytest.mark.parametrize("valid", [1, 700, 2048])
def test_flash_matches_oracle(valid):
    rng = np.random.RandomState(0)
    b, lq, lk, h, d = 2, 300, 2048, 4, 32
    q = rng.randn(b, lq, h * d).astype(np.float32)
    k = rng.randn(b, lk, h * d).astype(np.float32)
    v = rng.randn(b, lk, h * d).astype(np.float32)
    vl = jnp.asarray([valid, max(1, valid // 2)], jnp.int32)

    got = np.asarray(flash_memory_attention(
        q, k, v, vl, num_heads=h, block_q=128, block_k=256, interpret=True))
    want = np.asarray(global_attention(q, k, v, num_heads=h, valid_len=vl))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_uneven_shapes():
    rng = np.random.RandomState(1)
    b, lq, lk, h, d = 1, 130, 900, 2, 16
    q = rng.randn(b, lq, h * d).astype(np.float32)
    k = rng.randn(b, lk, h * d).astype(np.float32)
    v = rng.randn(b, lk, h * d).astype(np.float32)
    vl = jnp.asarray([900], jnp.int32)
    got = np.asarray(flash_memory_attention(
        q, k, v, vl, num_heads=h, block_q=128, block_k=512, interpret=True))
    want = np.asarray(global_attention(q, k, v, num_heads=h, valid_len=vl))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
