"""B-scaling probe for the three attention forms inside propagate, at the
exact AOTT eval shapes (grid 30x30=900 tokens, d_model 256, 8 heads).

bench_vb_parts.py shows propagate costs 14.5 ms at B=8 vs 9.8 expected
from 8x the B=1 cost; this times each attention op (and the FFN-ish
matmul chain as a control) standalone at B=1 and B=8, chained through a
donated scan so the tunnel cannot overlap dispatch, to find which op
scales superlinearly with batch.

Usage: python tools/bench_attn_bscale.py [--batches 1 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--tokens", type=int, default=900)  # 30x30 grid
    ap.add_argument("--hgt", type=int, default=30)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--cv", type=int, default=256,
                    help="value channels (AOTT ST attention: d_model=256)")
    ap.add_argument("--relv", type=int, default=1,
                    help="include the relative value bias (the real ST "
                         "attention has it; its extraction is extra work "
                         "for the dense forms)")
    ap.add_argument("--win", type=int, default=15)  # max_dis 7
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--scan_k", type=int, default=16)
    ap.add_argument("--forms", type=str, default="all",
                    help="comma list of forms to time "
                         "(global,window,toeplitz,flat,pallas,matmul); "
                         "'all' runs everything. The toeplitz form "
                         "compiles ~17 min at B=1 on TPU — skip it when "
                         "probing kernels.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from aot_tpu.utils.runtime import setup_runtime
    setup_runtime(matmul_precision="high")

    from aot_tpu.ops.attention import (
        global_attention, local_attention_window,
        _local_attention_dense_mxu)
    from aot_tpu.ops.pallas.local_window_attn import (
        local_window_attention_flat, local_window_attention_wide)

    L, h, d = args.tokens, args.heads, args.d
    hgt = args.hgt
    wid = L // hgt
    max_dis = args.win // 2
    rng = np.random.RandomState(0)

    def timed(name, fn, make_xs0, B):
        xs0 = make_xs0()  # fresh arrays: prior op's run donated its copy
        @partial(jax.jit, donate_argnums=(0,))
        def scan_fn(xs):
            def step(carry, _):
                out = fn(carry)
                # feed output back as next q to chain iterations
                new = tuple(c * 0.999 + out[..., :c.shape[-1]] * 0.001
                            for c in carry)
                return new, out[0, 0, :1]
            return jax.lax.scan(step, xs, None, length=args.scan_k)

        xs, out = scan_fn(xs0)
        np.asarray(out)
        xs, out = scan_fn(xs)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            xs, out = scan_fn(xs)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / (args.reps * args.scan_k) * 1e3
        print(f"  {name:28s} B={B}: {ms:8.4f} ms", flush=True)
        return ms

    forms = (("global", "window", "toeplitz", "flat", "pallas", "matmul")
             if args.forms == "all" else tuple(args.forms.split(",")))

    res = {}
    for B in args.batches:
        print(f"[bscale] B={B} L={L} h={h} d={d}", flush=True)
        nq = rng.rand(B, L, d).astype(np.float32)
        nk = rng.rand(B, L, d).astype(np.float32)
        nv = rng.rand(B, L, args.cv).astype(np.float32)
        rel_emb = jnp.asarray(
            rng.rand(B, h, L, args.win * args.win) * 0.1, jnp.float32)
        rel_v = (jnp.asarray(
            rng.rand(h, args.cv // h, args.win * args.win) * 0.1,
            jnp.float32) if args.relv else None)

        def mk_qkv():
            return (jnp.asarray(nq), jnp.asarray(nk), jnp.asarray(nv))

        w1 = jnp.asarray(rng.rand(d, 4 * d) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.rand(4 * d, d) * 0.05, jnp.float32)

        if "global" in forms:
            res[("global", B)] = timed(
                "global_attention 900x900",
                lambda c: global_attention(c[0], c[1], c[2], num_heads=h),
                mk_qkv, B)
        if "window" in forms:
            res[("window", B)] = timed(
                "local window 15x15",
                lambda c: local_attention_window(
                    c[0], c[1], c[2], rel_emb, rel_v, num_heads=h,
                    size_2d=(hgt, wid), max_dis=max_dis),
                mk_qkv, B)
        if "toeplitz" in forms:
            res[("toeplitz", B)] = timed(
                "dense mxu-toeplitz 15x15",
                lambda c: _local_attention_dense_mxu(
                    c[0], c[1], c[2], rel_emb, rel_v, num_heads=h,
                    size_2d=(hgt, wid), max_dis=max_dis),
                mk_qkv, B)
        if jax.default_backend() == "tpu":
            if "flat" in forms:
                res[("flat", B)] = timed(
                    "pallas flat kernel 15x15",
                    lambda c: local_window_attention_flat(
                        c[0], c[1], c[2], rel_emb, rel_v, num_heads=h,
                        size_2d=(hgt, wid), max_dis=max_dis),
                    mk_qkv, B)
            if "pallas" in forms:
                res[("pallas", B)] = timed(
                    "pallas wide kernel 15x15",
                    lambda c: local_window_attention_wide(
                        c[0], c[1], c[2], rel_emb, rel_v, num_heads=h,
                        size_2d=(hgt, wid), max_dis=max_dis),
                    mk_qkv, B)
        if "matmul" in forms:
            res[("matmul", B)] = timed(
                "control: 4x (900,256)@(256,1024)",
                lambda c: jnp.tanh(
                    (((c[0] @ w1) @ w2) @ w1) @ w2),
                lambda: mk_qkv()[:1], B)

    if len(args.batches) == 2:
        b0, b1 = args.batches
        print(f"[bscale] scaling B={b0}->B={b1} (ideal {b1 / b0:.1f}x):")
        for key in ("global", "window", "toeplitz", "flat", "pallas", "matmul"):
            if (key, b0) in res and (key, b1) in res:
                print(f"  {key:10s} {res[(key, b1)] / res[(key, b0)]:.2f}x")


if __name__ == "__main__":
    main()
