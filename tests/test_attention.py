"""Correctness tests for attention ops vs naive loop oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.ops.attention import (
    global_attention,
    local_attention,
    relative_emb_from_q,
)


def naive_local_attention(q, k, v, rel_bias, rel_v, num_heads, H, W, max_dis, dilation):
    """Straight-from-the-paper loop implementation: per query, a dilated
    (2*max_dis+1)^2 window, softmax over in-image slots, value sum plus
    relative value bias."""
    B, HW, _ = q.shape
    h = num_heads
    d = q.shape[-1] // h
    dv = v.shape[-1] // h
    win = 2 * max_dis + 1
    out = np.zeros((B, HW, v.shape[-1]), np.float64)
    qh = q.reshape(B, HW, h, d).astype(np.float64) / math.sqrt(d)
    kh = k.reshape(B, HW, h, d).astype(np.float64)
    vh = v.reshape(B, HW, h, dv).astype(np.float64)
    for b in range(B):
        for hd in range(h):
            for qy in range(H):
                for qx in range(W):
                    qi = qy * W + qx
                    scores, keys, wins = [], [], []
                    for wy in range(win):
                        for wx in range(win):
                            ky = qy + (wy - max_dis) * dilation
                            kx = qx + (wx - max_dis) * dilation
                            w_idx = wy * win + wx
                            if 0 <= ky < H and 0 <= kx < W:
                                ki = ky * W + kx
                                s = qh[b, qi, hd] @ kh[b, ki, hd]
                                s += rel_bias[b, hd, qi, w_idx]
                                scores.append(s)
                                keys.append(ki)
                                wins.append(w_idx)
                    scores = np.array(scores)
                    attn = np.exp(scores - scores.max())
                    attn /= attn.sum()
                    acc = np.zeros(dv)
                    for a, ki, wi in zip(attn, keys, wins):
                        acc += a * vh[b, ki, hd]
                        if rel_v is not None:
                            acc += a * rel_v[hd, :, wi]
                    out[b, qi, hd * dv:(hd + 1) * dv] = acc
    return out


@pytest.mark.parametrize("dilation", [1, 2])
@pytest.mark.parametrize("num_heads", [1, 2])
def test_local_attention_matches_naive(num_heads, dilation):
    rng = np.random.RandomState(0)
    H, W, max_dis = 5, 6, 2
    HW = H * W
    B, d, dv = 2, 4 * num_heads, 6 * num_heads
    q = rng.randn(B, HW, d).astype(np.float32)
    k = rng.randn(B, HW, d).astype(np.float32)
    v = rng.randn(B, HW, dv).astype(np.float32)
    win2 = (2 * max_dis + 1) ** 2
    rel_bias = rng.randn(B, num_heads, HW, win2).astype(np.float32) * 0.3
    rel_v = rng.randn(num_heads, dv // num_heads, win2).astype(np.float32) * 0.3

    got = np.asarray(local_attention(
        q, k, v, jnp.asarray(rel_bias), jnp.asarray(rel_v),
        num_heads=num_heads, size_2d=(H, W), max_dis=max_dis,
        dilation=dilation))
    want = naive_local_attention(
        q, k, v, rel_bias, rel_v, num_heads, H, W, max_dis, dilation)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_local_attention_no_rel_v():
    rng = np.random.RandomState(1)
    H, W, max_dis, h = 4, 4, 1, 1
    HW = H * W
    q = rng.randn(1, HW, 4).astype(np.float32)
    k = rng.randn(1, HW, 4).astype(np.float32)
    v = rng.randn(1, HW, 8).astype(np.float32)
    rel_bias = rng.randn(1, h, HW, 9).astype(np.float32)
    got = np.asarray(local_attention(
        q, k, v, jnp.asarray(rel_bias), None, num_heads=h, size_2d=(H, W),
        max_dis=max_dis))
    want = naive_local_attention(q, k, v, rel_bias, None, h, H, W, max_dis, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_global_attention_valid_len_equals_slicing():
    """Ring-buffer masking == attending to only the live tokens."""
    rng = np.random.RandomState(2)
    B, Lq, Lk, C = 2, 7, 20, 16
    q = rng.randn(B, Lq, C).astype(np.float32)
    k = rng.randn(B, Lk, C).astype(np.float32)
    v = rng.randn(B, Lk, C).astype(np.float32)
    n = 11
    full = np.asarray(global_attention(q, k, v, num_heads=4, valid_len=n))
    sliced = np.asarray(global_attention(q, k[:, :n], v[:, :n], num_heads=4))
    np.testing.assert_allclose(full, sliced, rtol=1e-5, atol=1e-5)


def test_global_attention_per_sample_valid_len():
    rng = np.random.RandomState(3)
    B, Lq, Lk, C = 2, 5, 12, 8
    q = rng.randn(B, Lq, C).astype(np.float32)
    k = rng.randn(B, Lk, C).astype(np.float32)
    v = rng.randn(B, Lk, C).astype(np.float32)
    vl = jnp.asarray([4, 12])
    got = np.asarray(global_attention(q, k, v, num_heads=2, valid_len=vl))
    want0 = np.asarray(global_attention(q[:1], k[:1, :4], v[:1, :4], num_heads=2))
    want1 = np.asarray(global_attention(q[1:], k[1:], v[1:], num_heads=2))
    np.testing.assert_allclose(got[0], want0[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], want1[0], rtol=1e-5, atol=1e-5)


def test_global_attention_topk():
    """top_k filtering == zeroing non-top-k attention weights."""
    rng = np.random.RandomState(4)
    B, L, C = 1, 6, 8
    q = rng.randn(B, L, C).astype(np.float32)
    k = rng.randn(B, L, C).astype(np.float32)
    v = rng.randn(B, L, C).astype(np.float32)
    got = np.asarray(global_attention(q, k, v, num_heads=2, top_k=2))
    # naive: per (head, query) keep top-2 scores
    d = C // 2
    qh = q.reshape(B, L, 2, d).transpose(0, 2, 1, 3) / math.sqrt(d)
    kh = k.reshape(B, L, 2, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, 2, d).transpose(0, 2, 1, 3)
    s = qh @ kh.transpose(0, 1, 3, 2)
    out = np.zeros_like(vh)
    for h in range(2):
        for i in range(L):
            idx = np.argsort(s[0, h, i])[-2:]
            e = np.exp(s[0, h, i, idx] - s[0, h, i, idx].max())
            a = e / e.sum()
            out[0, h, i] = (a[:, None] * vh[0, h, idx]).sum(0)
    want = out.transpose(0, 2, 1, 3).reshape(B, L, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_relative_emb_from_q():
    """Grouped 1x1 conv == per-head einsum."""
    rng = np.random.RandomState(5)
    B, HW, h, d, win2 = 2, 6, 2, 3, 9
    q = rng.randn(B, HW, h * d).astype(np.float32)
    w = rng.randn(h, win2, d).astype(np.float32)
    bias = rng.randn(h, win2).astype(np.float32)
    got = np.asarray(relative_emb_from_q(q, w, bias, h))
    want = np.zeros((B, h, HW, win2))
    for b in range(B):
        for hd in range(h):
            for l in range(HW):
                want[b, hd, l] = w[hd] @ q[b, l, hd * d:(hd + 1) * d] + bias[hd]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dilation", [1, 2])
def test_local_attention_window_matches_naive(dilation):
    """The training (gather-free, shift-based) formulation vs the loop
    oracle, including boundary masking, rel biases and dilation."""
    from aot_tpu.ops.attention import local_attention_window

    rng = np.random.RandomState(3)
    H, W, max_dis, h = 5, 6, 2, 2
    HW = H * W
    B, d, dv = 2, 4 * h, 6 * h
    q = rng.randn(B, HW, d).astype(np.float32)
    k = rng.randn(B, HW, d).astype(np.float32)
    v = rng.randn(B, HW, dv).astype(np.float32)
    win2 = (2 * max_dis + 1) ** 2
    rel_bias = rng.randn(B, h, HW, win2).astype(np.float32) * 0.3
    rel_v = rng.randn(h, dv // h, win2).astype(np.float32) * 0.3

    got = np.asarray(local_attention_window(
        q, k, v, jnp.asarray(rel_bias), jnp.asarray(rel_v),
        num_heads=h, size_2d=(H, W), max_dis=max_dis, dilation=dilation))
    want = naive_local_attention(
        q, k, v, rel_bias, rel_v, h, H, W, max_dis, dilation)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_local_attention_window_grads_match_dense():
    """Training dispatch uses the window formulation; its gradients must
    match the dense path's."""
    from aot_tpu.ops.attention import (
        _local_attention_dense,
        local_attention_window,
    )

    rng = np.random.RandomState(4)
    H, W, max_dis, h = 4, 5, 1, 2
    HW = H * W
    q = rng.randn(1, HW, 4 * h).astype(np.float32)
    k = rng.randn(1, HW, 4 * h).astype(np.float32)
    v = rng.randn(1, HW, 4 * h).astype(np.float32)
    rel_bias = jnp.asarray(rng.randn(1, h, HW, 9).astype(np.float32) * 0.3)
    rel_v = jnp.asarray(rng.randn(h, 4, 9).astype(np.float32) * 0.3)

    def loss(fn, q_, k_, v_):
        return jnp.sum(fn(q_, k_, v_, rel_bias, rel_v, num_heads=h,
                          size_2d=(H, W), max_dis=max_dis) ** 2)

    g_w = jax.grad(lambda *a: loss(local_attention_window, *a),
                   argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(lambda *a: loss(_local_attention_dense, *a),
                   argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_w, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("case", [
    # (H, W, max_dis, heads, rel_v?) — W > win, W == win boundary, no rel_v
    (4, 8, 1, 2, True),
    (4, 3, 1, 1, True),
    (3, 7, 1, 2, False),
])
def test_local_attention_dense_mxu_bitexact(case):
    """The gather-free MXU-Toeplitz serving form must be BIT-exact vs the
    dense oracle: same matmuls, same mask, only the bias placement differs
    (separable one-hot matmuls instead of take_along_axis)."""
    from aot_tpu.ops.attention import (
        _local_attention_dense,
        _local_attention_dense_mxu,
    )

    H, W, max_dis, h, use_rel_v = case
    rng = np.random.RandomState(5)
    HW = H * W
    win2 = (2 * max_dis + 1) ** 2
    B, dv = 2, 4 * h
    q = rng.randn(B, HW, 4 * h).astype(np.float32)
    k = rng.randn(B, HW, 4 * h).astype(np.float32)
    v = rng.randn(B, HW, dv).astype(np.float32)
    rel_bias = jnp.asarray(rng.randn(B, h, HW, win2).astype(np.float32) * 0.3)
    rel_v = (jnp.asarray(rng.randn(h, dv // h, win2).astype(np.float32) * 0.3)
             if use_rel_v else None)

    kw = dict(num_heads=h, size_2d=(H, W), max_dis=max_dis)
    want = np.asarray(_local_attention_dense(q, k, v, rel_bias, rel_v, **kw))
    got = np.asarray(
        _local_attention_dense_mxu(q, k, v, rel_bias, rel_v, **kw))
    assert np.array_equal(got, want)
