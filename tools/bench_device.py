"""Lean device-limit FPS measurement for any model variant.

Measures ONLY the distinct-frame scan number (the headline column of
PERFORMANCE.md's model table) — no tunnel/chunked/video-batch passes, so a
model costs ~2 compiles per dtype instead of bench.py's ~8. Used to
re-measure the rounds-1-3 constant-frame rows under the round-4 honest
harness (see PERFORMANCE.md "Measurement correction (round 4)").

Usage: python tools/bench_device.py --model deaott [--dtypes float32 bfloat16]
Prints one JSON line per (model, dtype).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINES  # noqa: E402


def measure(model_name: str, dtype: str, n_objects: int, n_frames: int,
            lt_cap: int | None) -> dict:
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aot_tpu.configs import build_config
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.runtime import setup_runtime

    # lt_cap=None means "bench default": cap 8 steady ring, except
    # gap-9999 models (AOTT/S/B-class) whose honest steady ring is cap 1
    # (they never write LT after the reference frame). An explicit
    # --lt_cap is always honored, matching bench.py's
    # "BENCH_LT_CAP not in os.environ" guard.
    user_cap = lt_cap is not None
    lt_cap = lt_cap if user_cap else 8
    cfg = build_config(stage="pre_ytb_dav", model=model_name,
                       TEST_DTYPE=dtype, TEST_LONG_TERM_MEM_CAP=lt_cap,
                       TEST_LONG_TERM_MEM_POLICY="fifo")
    if cfg.TEST_LONG_TERM_MEM_GAP >= 9999 and not user_cap:
        lt_cap = 1
        cfg = build_config(stage="pre_ytb_dav", model=model_name,
                           TEST_DTYPE=dtype, TEST_LONG_TERM_MEM_CAP=1,
                           TEST_LONG_TERM_MEM_POLICY="fifo")
    setup_runtime(matmul_precision=cfg.TEST_MATMUL_PRECISION)
    model = build_vos_model(cfg, eval_mode=True)
    eng = build_infer_engine(model, cfg)

    H = W = 465 if cfg.MODEL_ALIGN_CORNERS else 464
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    oh = jnp.zeros((1, H, W, 11), jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img0, oh)["params"]

    mask = np.zeros((1, H, W), np.int32)
    side = int(np.ceil(np.sqrt(n_objects)))
    cell = H // (side + 1)
    for i in range(n_objects):
        y, x = (i // side) * cell + 10, (i % side) * cell + 10
        mask[0, y:y + cell - 15, x:x + cell - 15] = i + 1

    state = jax.jit(lambda p, i, m: eng.add_reference_frame(
        p, i, m, obj_num=n_objects))(params, img0, jnp.asarray(mask))

    scan_k = 8
    dev_frames = jnp.asarray(
        (rng.rand(scan_k, 1, H, W, 3) * 255).astype(np.uint8))

    @jax.jit
    def scan_steps(p, s, fs):
        def body(carry, f):
            s2, pr, _ = eng.step(p, carry, f, output_size=(H, W))
            return s2, pr[0, ::64, ::64]
        return jax.lax.scan(body, s, fs)

    state, prs = scan_steps(params, state, dev_frames)
    np.asarray(prs)
    state, prs = scan_steps(params, state, dev_frames)  # steady-state sig
    np.asarray(prs)
    reps = max(1, n_frames // scan_k)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, prs = scan_steps(params, state, dev_frames)
    np.asarray(prs)
    device_ms = (time.perf_counter() - t0) / (reps * scan_k) * 1e3

    base = BASELINES.get(model_name)
    # dtype is part of the metric name for non-fp32 runs so JSON consumers
    # merging rows by metric cannot conflate a bf16 FPS with the headline
    # fp32 comparison; the vs_baseline for bf16 rows is annotated.
    suffix = "" if dtype == "float32" else f"_{dtype.replace('float', 'f')}"
    out = {
        "metric": f"{model_name}_480p_{n_objects}obj{suffix}_device_fps",
        "dtype": dtype,
        "value": round(1000.0 / device_ms, 2),
        "unit": "frames/s",
        "device_ms_per_frame": round(device_ms, 3),
        "lt_cap": lt_cap,
        **({"vs_baseline": round(1000.0 / device_ms / base, 3)}
           if base else {}),
    }
    if base and dtype != "float32":
        out["vs_baseline_note"] = (
            f"{dtype} device FPS over the reference's fp32 attached-V100 "
            "end-to-end number — not the headline fp32 comparison")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="aott")
    ap.add_argument("--dtypes", nargs="+", default=["float32"])
    ap.add_argument("--objects", type=int, default=10)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--lt_cap", type=int, default=None,
                    help="LT ring cap; default: 8, or 1 for gap-9999 models")
    ap.add_argument("--skip_kernel_check", action="store_true")
    args = ap.parse_args()
    kernels_ok = None
    kernel_errs = None
    if not args.skip_kernel_check:
        # re-verify Pallas kernel numerics on this chip once per invocation
        # so re-measured PERFORMANCE.md rows carry a kernels_ok signal.
        # Matmul precision must be pinned BEFORE the check: the XLA oracle
        # at default (bf16-pass) precision differs from the fp32 kernels by
        # ~1e-3, which would read as a false kernel regression.
        try:
            from aot_tpu.ops.pallas.hw_check import run_numerics_checks
            from aot_tpu.utils.runtime import setup_runtime
            setup_runtime(matmul_precision="high")
            kernels_ok, kernel_errs = run_numerics_checks()
        except Exception as e:  # noqa: BLE001 — report, never hide
            kernels_ok, kernel_errs = False, {"error": str(e)}
        if not kernels_ok:
            print(f"KERNEL REGRESSION: {kernel_errs}", file=sys.stderr)
    for dt in args.dtypes:
        r = measure(args.model, dt, args.objects, args.frames, args.lt_cap)
        if kernels_ok is not None:
            r["kernels_ok"] = kernels_ok
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
