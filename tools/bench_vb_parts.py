"""Decompose the batched multi-video step (VOSInferEngine.step_videos) on
the real chip, per batch size.

bench.py's video_batch row measures only the full fused step; this times
cumulative PREFIXES of the step — encode / +propagate / +decode@grid /
+upsample+argmax / +update_memory(full) — each as a `lax.scan` over K
distinct frames with the engine state carried through the scan, so every
number is chained-in-context (the tunnel cannot overlap dispatch) and the
difference between consecutive prefixes is that stage's in-context cost.

The reference has no analogue (its multi-video parallelism is one video
per GPU process, networks/managers/evaluator.py:216-235); this tool exists
to locate where the one-chip batched form loses time vs B * single-video.

Usage: python tools/bench_vb_parts.py [--batches 1 8] [--model aott]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="aott")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--objects", type=int, default=10)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from aot_tpu.configs import build_config
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.runtime import setup_runtime

    cfg = build_config(stage="pre_ytb_dav", model=args.model,
                       TEST_DTYPE=args.dtype, TEST_LONG_TERM_MEM_CAP=1,
                       TEST_LONG_TERM_MEM_POLICY="fifo")
    if cfg.TEST_LONG_TERM_MEM_GAP < 9999:
        cfg = build_config(stage="pre_ytb_dav", model=args.model,
                           TEST_DTYPE=args.dtype, TEST_LONG_TERM_MEM_CAP=8,
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

    mask1 = np.zeros((H, W), np.int32)
    side = int(np.ceil(np.sqrt(args.objects)))
    cell = H // (side + 1)
    for i in range(args.objects):
        y, x = (i // side) * cell + 10, (i % side) * cell + 10
        mask1[y:y + cell - 15, x:x + cell - 15] = i + 1

    scan_k = 8
    reps = max(1, args.frames // scan_k)

    # prefix bodies: each returns (new_state, small output forcing compute)
    def body_encode(p, st, f):
        xs = eng.engine.encode_image(p, f)
        return st, xs[-1][:, ::64, ::8].sum()

    def body_prop(p, st, f):
        xs = eng.engine.encode_image(p, f)
        st = eng.engine.propagate(p, st, None, img_embs=xs)
        return st, st.embs[-1][:, ::64, ::8].sum()

    def body_decode_grid(p, st, f):
        xs = eng.engine.encode_image(p, f)
        st = eng.engine.propagate(p, st, None, img_embs=xs)
        logits = eng.engine.decode_logits(p, st, output_size=None)
        return st, logits[:, ::16, ::16, 0]

    def body_decode_full(p, st, f):
        from aot_tpu.ops.image import upsample_argmax
        xs = eng.engine.encode_image(p, f)
        st = eng.engine.propagate(p, st, None, img_embs=xs)
        logits = eng.engine.decode_logits(p, st, output_size=None)
        pred = upsample_argmax(logits, (H, W),
                               align_corners=eng.engine.align_corners)
        return st, pred[:, ::64, ::64]

    def body_full(p, st, f):
        st, pred = eng.step_videos(p, st, f, orig_size=(H, W))
        return st, pred[:, ::64, ::64]

    stages = [
        ("encode", body_encode),
        ("+propagate", body_prop),
        ("+decode@grid", body_decode_grid),
        ("+upsample+argmax", body_decode_full),
        ("+update_memory (FULL)", body_full),
    ]

    for B in args.batches:
        imgs = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
        masks = jnp.asarray(np.broadcast_to(mask1, (B, H, W)).copy())
        state0 = jax.jit(lambda p, i, m: eng.add_reference_frames_videos(
            p, i, m, [args.objects] * B))(params, imgs, masks)
        frames = jnp.asarray(
            (rng.rand(scan_k, B, H, W, 3) * 255).astype(np.uint8))

        print(f"[vb_parts] model={args.model} B={B} dtype={args.dtype} "
              f"size={H}")
        prev_ms = 0.0
        for name, body in stages:
            @partial(jax.jit, donate_argnums=(1,))
            def scan_fn(p, s, fs, _body=body):
                def step(carry, f):
                    return _body(p, carry, f)
                return jax.lax.scan(step, s, fs)

            st, out = scan_fn(params, state0, frames)
            np.asarray(out)
            st, out = scan_fn(params, st, frames)  # steady signature
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                st, out = scan_fn(params, st, frames)
            np.asarray(out)
            ms = (time.perf_counter() - t0) / (reps * scan_k) * 1e3
            print(f"  {name:26s} {ms:8.3f} ms/step "
                  f"(+{ms - prev_ms:7.3f})", flush=True)
            prev_ms = ms
            # state0 was donated on the first call; rebuild for next stage
            state0 = jax.jit(lambda p, i, m: eng.add_reference_frames_videos(
                p, i, m, [args.objects] * B))(params, imgs, masks)


if __name__ == "__main__":
    main()
