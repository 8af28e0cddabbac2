"""Differentiable flash attention vs the jnp oracle: values AND gradients
(interpret mode; the HW run is covered by tools/tpu_hw_check.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aot_tpu.ops.attention import global_attention, set_attn_impl
from aot_tpu.ops.pallas.flash_attn_vjp import flash_attention


@pytest.fixture(autouse=True)
def _force_oracle():
    set_attn_impl("xla")
    yield
    set_attn_impl("auto")


def _mk(b, lq, lk, h, d, dv, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, lq, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, lk, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, lk, h * dv), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("valid", [None, "partial"])
def test_flash_vjp_matches_oracle(valid):
    b, lq, lk, h, d, dv = 2, 130, 260, 2, 16, 16
    q, k, v = _mk(b, lq, lk, h, d, dv)
    vl = None if valid is None else jnp.asarray([lk, lk // 3], jnp.int32)

    def oracle(q_, k_, v_):
        return global_attention(q_, k_, v_, h, d, valid_len=vl)

    def mine(q_, k_, v_):
        return flash_attention(q_, k_, v_, vl, h, d, block_q=128,
                               block_k=128, interpret=True)

    want = oracle(q, k, v)
    got = mine(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradients through a scalar functional of the output
    w = jnp.asarray(np.random.RandomState(1).randn(*want.shape), jnp.float32)

    g_want = jax.grad(lambda *a: (oracle(*a) * w).sum(), argnums=(0, 1, 2))(
        q, k, v)
    g_got = jax.grad(lambda *a: (mine(*a) * w).sum(), argnums=(0, 1, 2))(
        q, k, v)
    for name, a, b_ in zip("qkv", g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch")


def test_flash_vjp_value_and_grad_bf16():
    """bf16 inputs: looser tolerance, checks dtype plumbing end to end."""
    b, lq, lk, h, d, dv = 1, 128, 128, 2, 16, 16
    q, k, v = _mk(b, lq, lk, h, d, dv, seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def oracle(q_, k_, v_):
        return global_attention(q_, k_, v_, h, d).astype(jnp.float32).sum()

    def mine(q_, k_, v_):
        return flash_attention(q_, k_, v_, None, h, d, block_q=128,
                               block_k=128,
                               interpret=True).astype(jnp.float32).sum()

    np.testing.assert_allclose(float(mine(q, k, v)), float(oracle(q, k, v)),
                               rtol=2e-2)
    g_want = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(mine, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=1e-1, atol=1e-1, err_msg=f"d{name} mismatch")
