"""Sweep the flash memory-attention kernel against the XLA path on the real
TPU at the AOTL long-memory eval shape (Lq=900, Lk=28.8k, h=8, d_att=32 —
the VERDICT round-2 target shape).

Chained-iteration timing: each iteration's q depends on the previous output,
so the loop measures device compute, not dispatch (axon tunnel rule).

Usage: python tools/bench_flash.py [--dtype float32] [--iters 30]
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
    ap.add_argument("--lq", type=int, default=900)
    ap.add_argument("--lk", type=int, default=28800)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d-att", type=int, default=32)
    ap.add_argument("--dv", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--valid-frac", type=float, default=1.0,
                    help="live fraction of the ring (grow policy keeps >0.5)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aot_tpu.utils.runtime import setup_runtime
    setup_runtime(matmul_precision="high")

    from aot_tpu.ops import attention as A
    from aot_tpu.ops.pallas.flash_mem_attn import flash_memory_attention

    dt = jnp.dtype(args.dtype)
    h, d, dv = args.heads, args.d_att, args.dv
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, args.lq, h * d), dt)
    k = jnp.asarray(rng.randn(1, args.lk, h * d), dt)
    v = jnp.asarray(rng.randn(1, args.lk, h * dv), dt)
    valid = jnp.asarray([int(args.lk * args.valid_frac)], jnp.int32)

    def timed(name, fn):
        # one jitted step per variant: attention + feedback chain, so the
        # loop below is a pure device-side dependency chain (tunnel rule)
        @jax.jit
        def step(x):
            out = fn(x)
            return out, q + 1e-6 * out[..., :h * d]

        out, x = step(q)  # compile + correctness probe
        jax.block_until_ready(x)
        ref = out
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, x = step(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 3),
                          "dtype": args.dtype,
                          "valid_frac": args.valid_frac}), flush=True)
        return ref

    # XLA oracle path
    A.set_attn_impl("xla")

    def xla_path(qq):
        return A.global_attention(qq, k, v, num_heads=h, d_att=d,
                                  valid_len=valid)

    ref = timed("xla", xla_path)

    for bq, bk in [(256, 1024), (512, 1024), (1024, 512), (1024, 1024),
                   (896, 1024), (896, 512), (512, 2048)]:
        try:
            def fl(qq, bq=bq, bk=bk):
                return flash_memory_attention(qq, k, v, valid, num_heads=h,
                                              d_att=d, block_q=bq,
                                              block_k=bk)
            out = timed(f"flash_bq{bq}_bk{bk}", fl)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(json.dumps({"variant": f"flash_bq{bq}_bk{bk}",
                              "max_abs_err_vs_xla": err}), flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"variant": f"flash_bq{bq}_bk{bk}",
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
