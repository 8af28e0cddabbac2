"""On-hardware kernel regression harness.

The pytest suite pins the CPU backend (tests/conftest.py), so the Pallas
kernels' HW numerics/perf are checked here instead: each kernel runs on the
real TPU against its jnp oracle and (optionally) a latency budget.

Usage: python tools/tpu_hw_check.py            # numerics only (~2 min)
       python tools/tpu_hw_check.py --timed    # + chained-jit latency gates
Prints one JSON line per check; exits non-zero on any FAIL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name, ok, **info):
    print(json.dumps({"check": name, "ok": bool(ok), **info}), flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timed", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from aot_tpu.utils.runtime import setup_runtime

    setup_runtime(matmul_precision="high")
    backend = jax.default_backend()
    check("backend_is_tpu", backend == "tpu", backend=backend)
    if backend != "tpu":
        sys.exit(1)

    rng = np.random.RandomState(0)

    # ---- kernel numerics vs jnp oracles (shared with bench.py) ---------
    from aot_tpu.ops.pallas.hw_check import run_numerics_checks

    _, errs = run_numerics_checks()
    check("flash_mem_attn_numerics", errs["flash_mem_attn"] < 5e-5,
          max_abs_err=errs["flash_mem_attn"])
    check("local_window_kernel_numerics",
          errs["local_window_kernel"] < 5e-4,
          max_abs_err=errs["local_window_kernel"])

    if not args.timed:
        return finish()

    from aot_tpu.ops import attention as A
    from aot_tpu.ops.pallas.flash_mem_attn import flash_memory_attention
    from aot_tpu.ops.pallas.local_window_attn import (
        local_window_attention_wide as local_window_attention)

    b, h, d, lq, lk = 2, 8, 32, 900, 7200
    q = jnp.asarray(rng.randn(b, lq, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, lk, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, lk, h * d), jnp.float32)
    vl = jnp.asarray([lk, int(lk * 0.6)], jnp.int32)
    hgt, wid, m = 46, 80, 7
    hw = hgt * wid
    win2 = (2 * m + 1) ** 2
    ql = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    kl = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    vlo = jnp.asarray(rng.randn(1, hw, h * d), jnp.float32)
    rb = jnp.asarray(0.3 * rng.randn(1, h, hw, win2), jnp.float32)
    rv = jnp.asarray(0.3 * rng.randn(h, d, win2), jnp.float32)

    # ---- latency gates (chained-jit; generous bounds vs measured) ------
    def timed(fn, x0):
        @jax.jit
        def step(x):
            o = fn(x)
            return o, x + 1e-6 * o

        o, x = step(x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o, x = step(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / args.iters * 1e3

    ms = timed(lambda x: flash_memory_attention(x, k, v, vl, h, d), q)
    check("flash_mem_attn_latency", ms < 8.0, ms=round(ms, 3),
          budget_ms=8.0, shape=[lq, lk])  # measured 4.6-5.6 ms; canary, not a race
    ms = timed(lambda x: local_window_attention(
        x, kl, vlo, rb, rv, num_heads=h, size_2d=(hgt, wid), max_dis=m,
        d_att=d), ql)
    check("local_window_kernel_latency", ms < 10.0, ms=round(ms, 3),
          budget_ms=10.0, shape=[hgt, wid])
    return finish()


def finish():
    if FAILURES:
        print(json.dumps({"result": "FAIL", "failures": FAILURES}))
        sys.exit(1)
    print(json.dumps({"result": "PASS"}))


if __name__ == "__main__":
    main()
