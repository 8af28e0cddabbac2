"""Benchmark the fused local-window Pallas kernel vs the XLA banded/dense
paths on the real TPU at full-resolution short-term-attention shapes
(1080p -> stride 16 -> 68x120 tokens; 480p -> 29x29).

Chained-iteration timing (axon tunnel rule): each iteration's q depends on
the previous output.

Usage: python tools/bench_local.py [--hgt 68 --wid 120] [--dtype float32]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hgt", type=int, default=68)
    ap.add_argument("--wid", type=int, default=120)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d-att", type=int, default=32)
    ap.add_argument("--dv", type=int, default=32)
    ap.add_argument("--max-dis", type=int, default=7)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--no-rel-v", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bands", type=int, nargs="+", default=[8, 16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aot_tpu.utils.runtime import setup_runtime
    setup_runtime(matmul_precision="high")

    from aot_tpu.ops import attention as A
    from aot_tpu.ops.pallas.local_window_attn import (
        local_window_attention, local_window_attention_wide)

    dt = jnp.dtype(args.dtype)
    b, h, d, dv, m = args.batch, args.heads, args.d_att, args.dv, args.max_dis
    hgt, wid = args.hgt, args.wid
    hw = hgt * wid
    win2 = (2 * m + 1) ** 2
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, hw, h * d), dt)
    k = jnp.asarray(rng.randn(b, hw, h * d), dt)
    v = jnp.asarray(rng.randn(b, hw, h * dv), dt)
    rb = jnp.asarray(0.3 * rng.randn(b, h, hw, win2), dt)
    rv = (None if args.no_rel_v
          else jnp.asarray(0.3 * rng.randn(h, dv, win2), dt))

    def timed(name, fn):
        @jax.jit
        def step(x):
            out = fn(x)
            return out, q + 1e-6 * out[..., : h * d] if h * dv >= h * d \
                else q + 1e-6 * jnp.pad(out, ((0, 0), (0, 0),
                                              (0, h * d - h * dv)))

        out, x = step(q)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, x = step(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 3),
                          "dtype": args.dtype, "shape": [b, hgt, wid]}),
              flush=True)
        return out

    def banded(qq):
        return A.local_attention_banded(qq, k, v, rb, rv, num_heads=h,
                                        size_2d=(hgt, wid), max_dis=m,
                                        d_att=d)

    ref = timed("xla_banded", banded)

    if hw <= 2500:
        def dense(qq):
            return A._local_attention_dense(qq, k, v, rb, rv, num_heads=h,
                                            size_2d=(hgt, wid), max_dis=m,
                                            d_att=d)
        timed("xla_dense", dense)

    impls = {"narrow": local_window_attention,
             "wide": local_window_attention_wide}
    for name, fn in impls.items():
        for rq in args.bands:
            def kern(qq, rq=rq, fn=fn):
                return fn(qq, k, v, rb, rv, num_heads=h,
                          size_2d=(hgt, wid), max_dis=m,
                          d_att=d, rows_per_band=rq)
            tag = f"pallas_{name}_rq{rq}"
            try:
                out = timed(tag, kern)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                print(json.dumps({"variant": tag,
                                  "max_abs_err_vs_banded": err}), flush=True)
            except Exception as e:
                print(json.dumps({"variant": tag,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
