"""Micro-bench the ops inside one LSTT propagate at TRAINING shapes.

bench_fwd_parts showed propagate = ~79 ms/frame at batch 8 (the whole
forward's cost); this times self-attn / long-term attn / short-term local
attn / FFN modules in isolation, fwd and fwd+bwd, under the training-trace
attention routing, to find which op burns the time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from aot_tpu.models import layers as ML
    from aot_tpu.ops.attention import attn_training_context

    B, L, C, H = 8, 900, 256, 8
    size_2d = (30, 30)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, C), dt)
    k = jax.random.normal(key, (B, L, C), dt)
    v = jax.random.normal(key, (B, L, C), dt)

    def run(name, fn, *a, grad=False):
        if grad:
            base = fn

            def scalar(*x):
                return jnp.sum(base(*x).astype(jnp.float32))
            fn = jax.grad(scalar)

        def wrapped(*x):
            with attn_training_context():
                return fn(*x)
        ms = timeit(jax.jit(wrapped), *a)
        print(f"  {name:50s} {ms:8.2f} ms")

    print(f"[bench_prop_parts] B={B} L={L} C={C} heads={H} dtype=bf16")

    mha = ML.MultiheadAttention(C, H, use_linear=True, dtype=dt)
    p1 = mha.init(key, q, q, v, deterministic=True)

    def selfattn(q_):
        return mha.apply(p1, q_, q_, q_, deterministic=False,
                         rngs={"dropout": key})
    run("self MultiheadAttention fwd", selfattn, q)
    run("self MultiheadAttention fwd+bwd", selfattn, q, grad=True)

    lt = ML.MultiheadAttention(C, H, use_linear=False, dtype=dt)
    p_lt = lt.init(key, q, k, v, deterministic=True)

    def ltattn(q_):
        return lt.apply(p_lt, q_, k, v, deterministic=False,
                        rngs={"dropout": key})
    run("LT MultiheadAttention fwd (Lk=900)", ltattn, q)
    run("LT MultiheadAttention fwd+bwd", ltattn, q, grad=True)

    loc = ML.MultiheadLocalAttention(C, H, max_dis=7, use_linear=False,
                                     dtype=dt)
    p2 = loc.init(key, q, k, v, size_2d, deterministic=True)

    def localattn(q_):
        return loc.apply(p2, q_, k, v, size_2d, deterministic=False,
                         rngs={"dropout": key})
    run("ST MultiheadLocalAttention fwd", localattn, q)
    run("ST MultiheadLocalAttention fwd+bwd", localattn, q, grad=True)

    ffn = ML.GNActDWConv2d(1024, dtype=dt)
    x = jax.random.normal(key, (B, L, 1024), dt)
    p3 = ffn.init(key, x, size_2d)
    run("GNActDWConv2d 1024 fwd",
        lambda x_: ffn.apply(p3, x_, size_2d), x)
    run("GNActDWConv2d 1024 fwd+bwd",
        lambda x_: ffn.apply(p3, x_, size_2d), x, grad=True)

    dp = ML.DropPath(0.1)
    pd = dp.init({"params": key, "droppath": key}, q, deterministic=True)
    run("DropPath fwd", lambda x_: dp.apply(
        pd, x_, deterministic=False, rngs={"droppath": key}), q)

    ln = ML.LayerNorm()
    pl = ln.init(key, q)
    run("LayerNorm fwd", lambda x_: ln.apply(pl, x_), q)


if __name__ == "__main__":
    main()
