"""Decompose the training loss-pipeline cost on the real chip.

The round-2 verdict: the per-frame loss pipeline (decode -> 4x upsample ->
465^2 CE with top-k mining + soft Jaccard) accounts for ~620 of 632 ms
forward at batch 8. This tool times each stage in isolation (forward and
forward+backward) so the round-3 optimisation attacks the measured
bottleneck, not the assumed one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aot_tpu.ops import losses as L
from aot_tpu.ops.image import interpolate_bilinear

B, H4, HW = 8, 117, 465
C = 11


def timeit(fn, *args, iters=20, warmup=3):
    fn = jax.jit(fn)
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    logits4 = jax.random.normal(key, (B, H4, H4, C), jnp.float32)
    logits = jax.random.normal(key, (B, HW, HW, C), jnp.float32)
    labels = jax.random.randint(key, (B, HW, HW), 0, C).astype(jnp.int32)
    obj_nums = jnp.full((B,), 3, jnp.int32)
    nll = jax.random.uniform(key, (B, HW * HW), jnp.float32)
    k = jnp.int32(int(0.15 * HW * HW))

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:45s} {ms:8.2f} ms")

    add("upsample 117->465 fp32 (fwd)",
        timeit(lambda x: interpolate_bilinear(x, (HW, HW)), logits4))
    add("upsample (fwd+bwd)",
        timeit(jax.grad(lambda x: interpolate_bilinear(x, (HW, HW)).sum()),
               logits4))

    add("log_softmax+gather 465^2 (fwd)",
        timeit(lambda lg: (-jnp.take_along_axis(
            jax.nn.log_softmax(lg, -1), labels[..., None], -1)).sum(), logits))

    add("sort 216k (fwd)", timeit(lambda x: jnp.sort(x, axis=1), nll))

    def topk_sort(x):
        srt = jnp.sort(x, axis=1)[:, ::-1]
        rank = jnp.arange(x.shape[1])[None, :]
        return ((srt * (rank < k)).sum(1) / k).sum()

    add("topk via sort (fwd)", timeit(topk_sort, nll))
    add("topk via sort (fwd+bwd)", timeit(jax.grad(topk_sort), nll))

    add("jaccard 465^2 (fwd)",
        timeit(lambda lg: L.soft_jaccard_loss(lg, labels, obj_nums).sum(),
               logits))
    add("jaccard (fwd+bwd)",
        timeit(jax.grad(
            lambda lg: L.soft_jaccard_loss(lg, labels, obj_nums).sum()),
            logits))

    add("CE+topk 465^2 (fwd)",
        timeit(lambda lg: L.cross_entropy_loss(
            lg, labels, obj_nums, top_k_percent=0.15,
            top_k_ratio=1.0).sum(), logits))
    add("CE+topk (fwd+bwd)",
        timeit(jax.grad(lambda lg: L.cross_entropy_loss(
            lg, labels, obj_nums, top_k_percent=0.15,
            top_k_ratio=1.0).sum()), logits))

    def full(lg4):
        lg = interpolate_bilinear(lg4, (HW, HW))
        return L.combined_vos_loss(lg, labels, obj_nums,
                                   top_k_percent=0.15, top_k_ratio=1.0).sum()

    add("FULL upsample+CE+jac (fwd)", timeit(full, logits4))
    add("FULL (fwd+bwd)", timeit(jax.grad(full), logits4))

    from aot_tpu.ops.image import (
        interpolate_bilinear_cf,
        interpolate_bilinear_matmul_cf,
    )

    logits4_cf = jnp.transpose(logits4, (0, 3, 1, 2))

    def full_cf(resize):
        def f(lg4):
            lg = resize(lg4, (HW, HW))
            return L.combined_vos_loss_cf(
                lg, labels, obj_nums,
                top_k_percent=0.15, top_k_ratio=1.0).sum()
        return f

    add("FULL_cf gather-resize (fwd+bwd)",
        timeit(jax.grad(full_cf(interpolate_bilinear_cf)), logits4_cf))
    add("FULL_cf matmul-resize (fwd+bwd)",
        timeit(jax.grad(full_cf(interpolate_bilinear_matmul_cf)), logits4_cf))
    print()
    print("per-step estimate (5 loss evals):",
          f"{5 * dict(rows)['FULL_cf matmul-resize (fwd+bwd)']:.0f} ms fwd+bwd")


if __name__ == "__main__":
    main()
