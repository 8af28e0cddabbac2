"""Single-chip inference benchmark.

Measures multi-object online VOS FPS on the flagship AOTT config at DAVIS
480p (465x465 stride-16-snapped), 10 objects, fully-online frame stepping —
the reference's headline setting (51.4 FPS on 1xV100, MODEL_ZOO.md:99).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# per-model multi-object FPS on 1xV100 (BASELINE.md; MODEL_ZOO.md:43-104)
BASELINES = {
    "aott": 51.4, "aots": 40.0, "aotb": 29.6, "aotl": 18.7,
    "r50_aotl": 18.0, "r101_aotl": 18.0, "rs101_aotl": 18.0,
    "swinb_aotl": 12.1,
    "deaott": 53.4, "deaots": 38.7, "deaotb": 30.4, "deaotl": 24.7,
    "r50_deaotl": 22.4, "swinb_deaotl": 11.9,
}
BASELINE_FPS = BASELINES["aott"]


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aot_tpu.configs import build_config
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.models import build_vos_model

    model_name = os.environ.get("BENCH_MODEL", "aott")
    n_objects = int(os.environ.get("BENCH_OBJECTS", "10"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    lt_cap = int(os.environ.get("BENCH_LT_CAP", "8"))
    lt_gap = int(os.environ.get("BENCH_LT_GAP", "0"))  # 0 = model default

    from aot_tpu.utils.runtime import setup_runtime

    over = {}
    if lt_gap > 0:
        over["TEST_LONG_TERM_MEM_GAP"] = lt_gap
    cfg = build_config(stage="pre_ytb_dav", model=model_name,
                       TEST_DTYPE=dtype, TEST_LONG_TERM_MEM_CAP=lt_cap,
                       **over,
                       # steady-state ring -> static shapes for the
                       # throughput loop (eval's default is 'grow')
                       TEST_LONG_TERM_MEM_POLICY="fifo")
    if cfg.TEST_LONG_TERM_MEM_GAP >= 9999 and "BENCH_LT_CAP" not in os.environ:
        # gap-9999 models (AOTT/S/B, DeAOTT/S/B) never write LT after the
        # reference frame, so real eval's 'grow' ring stays at ONE frame;
        # a cap-8 ring would pad their LT attention with 7x dead keys.
        # -L models keep the cap-8 steady ring (their gap fills it).
        lt_cap = 1
        cfg = build_config(stage="pre_ytb_dav", model=model_name,
                           TEST_DTYPE=dtype, TEST_LONG_TERM_MEM_CAP=1,
                           **over, TEST_LONG_TERM_MEM_POLICY="fifo")
    setup_runtime(matmul_precision=cfg.TEST_MATMUL_PRECISION)
    model = build_vos_model(cfg, eval_mode=True)

    H = W = 465 if cfg.MODEL_ALIGN_CORNERS else 464
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    oh = jnp.zeros((1, H, W, 11), jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img0, oh)["params"]

    eng = build_infer_engine(model, cfg)
    mask = np.zeros((1, H, W), np.int32)
    side = int(np.ceil(np.sqrt(n_objects)))
    cell = H // (side + 1)
    for i in range(n_objects):
        y, x = (i // side) * cell + 10, (i % side) * cell + 10
        mask[0, y:y + cell - 15, x:x + cell - 15] = i + 1

    add = jax.jit(lambda p, i, m: eng.add_reference_frame(p, i, m,
                                                          obj_num=n_objects))
    step = jax.jit(lambda p, s, i: eng.step(p, s, i, output_size=(H, W)),
                   donate_argnums=(1,))

    state = add(params, img0, jnp.asarray(mask))

    # distinct host frames (simulating decoded video, raw uint8 — the engine
    # normalises on device); measurement includes the per-frame host->device
    # transfer, pipelined as the evaluator does
    host_frames = [(rng.rand(1, H, W, 3) * 255).astype(np.uint8)
                   for _ in range(n_frames)]

    # warmup / compile — twice: the state returned by add_reference_frame
    # and the state returned by step trace to distinct signatures, so the
    # second call compiles again; both must be warm before timing
    state, pred, _ = step(params, state, jnp.asarray(host_frames[0]))
    state, pred, _ = step(params, state, jnp.asarray(host_frames[0]))
    jax.block_until_ready(pred)

    # bounded-depth pipeline: keep DEPTH frames in flight, fetch mask i
    # when submitting frame i+DEPTH — the realistic online-serving cadence
    # (amortises link latency without the unbounded-queue pathology the
    # tunnel exhibits when all frames are enqueued at once). Every fetched
    # mask is a REAL np.asarray readback; bare block_until_ready has been
    # observed to return before device completion on this tunnel.
    step_u8 = jax.jit(
        lambda p, s, i: (lambda st, pr, lg:
                         (st, pr.astype(jnp.uint8)))(
                             *eng.step(p, s, i, output_size=(H, W))),
        donate_argnums=(1,))
    state, pred = step_u8(params, state, jnp.asarray(host_frames[0]))
    state, pred = step_u8(params, state, jnp.asarray(host_frames[0]))
    np.asarray(pred)
    depth = 8
    fifo = []
    t0 = time.perf_counter()
    for f in host_frames:
        state, pred = step_u8(params, state, jnp.asarray(f))
        fifo.append(pred)
        if len(fifo) > depth:
            np.asarray(fifo.pop(0))
    for pr in fifo:
        np.asarray(pr)
    dt = time.perf_counter() - t0
    pipelined_fps = n_frames / dt

    # device-only: K steps per dispatch via lax.scan + forced readback —
    # pure per-frame device compute, independent of the tunnel's dispatch
    # and transfer latency (the number that scales with memory length).
    # The scan MUST run over K DISTINCT frames: with a constant frame XLA
    # hoists the whole image-dependent branch (encoder + attention Q side,
    # ~45% of the step: 5.05 vs 9.47 ms/frame measured on v5e) out of the
    # loop, silently inflating FPS. (Rounds 1-3 reported the constant-frame
    # number — corrected here.)
    scan_k = 8
    dev_frames = jnp.asarray(np.stack(host_frames[:scan_k]))  # (K,1,H,W,3) u8
    dev_frame = dev_frames[0]
    # v5e (v5 lite) peak 197 TFLOP/s bf16; fp32 eval runs matmuls through
    # the MXU in multi-pass bf16 ('high' precision), so bf16 peak is the
    # roofline either way.
    V5E_PEAK_FLOPS = 197e12

    @jax.jit
    def scan_steps(p, s, fs):
        def body(carry, f):
            s2, pr, _ = eng.step(p, carry, f, output_size=(H, W))
            return s2, pr[0, ::64, ::64]
        return jax.lax.scan(body, s, fs)

    dstate, prs = scan_steps(params, state, dev_frames)
    np.asarray(prs)
    reps = max(1, n_frames // scan_k)
    t0 = time.perf_counter()
    for _ in range(reps):
        dstate, prs = scan_steps(params, dstate, dev_frames)
    np.asarray(prs)  # one readback; the dstate chain serialises all reps
    device_ms = (time.perf_counter() - t0) / (reps * scan_k) * 1e3

    # batched multi-video serving (BENCH_VIDEO_BATCH=N, default 8): N
    # independent videos stepped in one dispatch over the engine's batch
    # axis — converts idle MXU into aggregate throughput (the TPU-native
    # form of the reference's multi-GPU eval queue, evaluator.py:216-235).
    # Scan-chained like the device-limit number; aggregate FPS = N/frame-ms.
    video_batch = int(os.environ.get("BENCH_VIDEO_BATCH", "8"))
    vb_fps = None
    vb_mfu = None
    if video_batch > 1:
        n_obj_vb = min(n_objects, 10)
        vb_imgs = jnp.asarray(rng.rand(video_batch, H, W, 3), jnp.float32)
        vb_mask = jnp.asarray(
            np.broadcast_to(mask, (video_batch, H, W)).copy())
        vb_state = jax.jit(
            lambda p, i, m: eng.add_reference_frames_videos(
                p, i, m, [n_obj_vb] * video_batch)
        )(params, vb_imgs, vb_mask)

        # distinct frames per scan step (see scan_steps note)
        vb_frames = jnp.asarray(
            (rng.rand(scan_k, video_batch, H, W, 3) * 255).astype(np.uint8))

        # donate the carried state: without donation every dispatch copies
        # the B-videos engine state (LT/ST rings + 4 encoder shortcut maps,
        # tens of MB at B=8) instead of updating it in place
        @partial(jax.jit, donate_argnums=(1,))
        def vb_scan(p, s, fs):
            def body(carry, f):
                s2, pr = eng.step_videos(p, carry, f, orig_size=(H, W))
                return s2, pr[:, ::64, ::64]
            return jax.lax.scan(body, s, fs)

        vb_state, prs = vb_scan(params, vb_state, vb_frames)
        np.asarray(prs)
        t0 = time.perf_counter()
        for _ in range(reps):
            vb_state, prs = vb_scan(params, vb_state, vb_frames)
        np.asarray(prs)
        vb_ms = (time.perf_counter() - t0) / (reps * scan_k) * 1e3
        vb_fps = video_batch * 1000.0 / vb_ms
        # FLOPs from an UNSCANNED single-dispatch lowering: XLA's
        # cost_analysis counts a while-loop body once regardless of trip
        # count, so lowering the scan would undercount by scan_k.
        try:
            vb_step = jax.jit(lambda p, s, f: eng.step_videos(
                p, s, f, orig_size=(H, W)))
            vb_cost = vb_step.lower(
                params, vb_state, vb_imgs).compile().cost_analysis()
            if isinstance(vb_cost, (list, tuple)):
                vb_cost = vb_cost[0]
            vb_flops = float(vb_cost.get("flops", 0.0))
        except Exception:
            vb_flops = 0.0
        vb_mfu = vb_flops / (vb_ms / 1e3) / V5E_PEAK_FLOPS

    # chunked serving (engine.step_chunk, TEST_FRAME_CHUNK analogue): K
    # distinct frames uploaded as ONE uint8 array, K steps scanned on
    # device with mask feedback, K uint8 masks read back once — a real
    # end-to-end measurement of offline-eval throughput that amortises the
    # tunnel's per-dispatch latency without the device-limit projection.
    chunk_k = int(os.environ.get("BENCH_CHUNK", "32"))
    # masks are <= (n_objects+1)-valued: 4-bit-pack them on device before
    # the fetch (halves the dominant downlink term of the mandatory
    # per-chunk traffic); host-side unpack is inside the timed loop.
    pack_masks = n_objects <= 15
    from aot_tpu.ops.image import pack_labels_4bit, unpack_labels_4bit_np

    def _chunk(p, s, f):
        st, pr = eng.step_chunk(p, s, f, orig_size=(H, W),
                                input_size=(H, W))
        return st, (pack_labels_4bit(pr) if pack_masks else pr)

    chunk_fn = jax.jit(_chunk)
    reps_c = max(1, n_frames // chunk_k)
    chunks = [np.stack(host_frames[(i * chunk_k) % n_frames:
                                   (i * chunk_k) % n_frames + chunk_k])
              for i in range(reps_c)]
    chunks = [c for c in chunks if c.shape[0] == chunk_k] or \
        [np.stack([host_frames[0]] * chunk_k)]
    cstate, cpreds = chunk_fn(params, state, jnp.asarray(chunks[0]))
    np.asarray(cpreds)
    t0 = time.perf_counter()
    for c in chunks:
        cstate, cpreds = chunk_fn(params, cstate, jnp.asarray(c))
        got = np.asarray(cpreds)  # K-mask readback, blocks
        if pack_masks:
            unpack_labels_4bit_np(got, W)
    dt_chunk = time.perf_counter() - t0
    chunked_fps = len(chunks) * chunk_k / dt_chunk

    # sync mode: block on and read back every mask before feeding the next
    # frame — the reference evaluator's cadence (evaluator.py:408-region,
    # per-frame torch.cuda sync). Includes host<->device link latency, so on
    # a tunneled chip this is link-bound, not compute-bound. Masks travel as
    # uint8: the axon tunnel's int32 downlink path is ~100x slower.
    t0 = time.perf_counter()
    for f in host_frames:
        state, pred = step_u8(params, state, jnp.asarray(f))
        np.asarray(pred)  # device->host mask fetch, blocks
    dt_sync = time.perf_counter() - t0
    sync_fps = n_frames / dt_sync

    # MFU: compiled FLOPs per frame / device time / chip peak.
    try:
        cost = step_u8.lower(
            params, state, dev_frame).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_frame = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_frame = 0.0
    mfu = flops_per_frame / (device_ms / 1e3) / V5E_PEAK_FLOPS

    # Pallas kernel numerics on the real chip — every bench run re-verifies
    # both kernel families against their jnp oracles so Mosaic drift is
    # caught by the driver's end-of-round capture, not by a manual tool.
    try:
        from aot_tpu.ops.pallas.hw_check import run_numerics_checks

        kernels_ok, kernel_errs = run_numerics_checks()
    except Exception as e:  # noqa: BLE001 — report, never hide
        kernels_ok, kernel_errs = False, {"error": str(e)}
    if not kernels_ok:
        print(f"KERNEL REGRESSION: {kernel_errs}", file=sys.stderr)

    # bf16 serving point (BENCH_BF16=0 to skip): same model/weights with
    # TEST_DTYPE=bfloat16, device-limit cadence. Mask agreement vs the fp32
    # torch reference is pinned by artifacts/equiv_bf16*.json (see
    # PERFORMANCE.md "bf16 serving"); this captures the FPS/MFU side.
    bf16_fields = {}
    if dtype == "float32" and os.environ.get("BENCH_BF16", "1") != "0":
        from aot_tpu.configs import build_config as _bc

        cfg16 = _bc(stage="pre_ytb_dav", model=model_name,
                    TEST_DTYPE="bfloat16", TEST_LONG_TERM_MEM_CAP=lt_cap,
                    **over, TEST_LONG_TERM_MEM_POLICY="fifo")
        model16 = build_vos_model(cfg16, eval_mode=True)
        eng16 = build_infer_engine(model16, cfg16)
        state16 = jax.jit(
            lambda p, i, m: eng16.add_reference_frame(
                p, i, m, obj_num=n_objects))(params, img0, jnp.asarray(mask))

        @jax.jit
        def scan16(p, s, fs):
            def body(carry, f):
                s2, pr, _ = eng16.step(p, carry, f, output_size=(H, W))
                return s2, pr[0, ::64, ::64]
            return jax.lax.scan(body, s, fs)

        state16, prs16 = scan16(params, state16, dev_frames)
        np.asarray(prs16)
        state16, prs16 = scan16(params, state16, dev_frames)  # steady state
        np.asarray(prs16)
        t0 = time.perf_counter()
        for _ in range(reps):
            state16, prs16 = scan16(params, state16, dev_frames)
        np.asarray(prs16)
        ms16 = (time.perf_counter() - t0) / (reps * scan_k) * 1e3
        # unscanned lowering for FLOPs — see vb_step note above
        try:
            step16 = jax.jit(lambda p, s, f: eng16.step(
                p, s, f, output_size=(H, W))[:2])
            cost16 = step16.lower(
                params, state16, dev_frame).compile().cost_analysis()
            if isinstance(cost16, (list, tuple)):
                cost16 = cost16[0]
            flops16 = float(cost16.get("flops", 0.0))
        except Exception:
            flops16 = 0.0
        bf16_fields = {
            "bf16_device_fps": round(1000.0 / ms16, 2),
            "bf16_device_ms_per_frame": round(ms16, 3),
            "bf16_mfu": round(flops16 / (ms16 / 1e3) / V5E_PEAK_FLOPS, 4),
        }

    # second model row (BENCH_SECOND_MODEL, default deaott; "" skips): the
    # record of round-over-round FPS should not be single-model — this
    # reuses the lean device-limit harness for one more variant per run.
    second_fields = {}
    second_name = os.environ.get("BENCH_SECOND_MODEL", "deaott")
    if second_name and second_name != model_name:
        try:
            from tools.bench_device import measure as _measure_model

            r2 = _measure_model(second_name, "float32", n_objects,
                                n_frames=24, lt_cap=None)
            second_fields = {
                "second_model": second_name,
                "second_model_device_fps": r2["value"],
                "second_model_device_ms_per_frame":
                    r2["device_ms_per_frame"],
                "second_model_vs_baseline": r2.get("vs_baseline"),
                "second_model_lt_cap": r2["lt_cap"],
            }
        except Exception as e:  # noqa: BLE001 — report, never hide
            second_fields = {"second_model": second_name,
                             "second_model_error": str(e)}

    # headline = device-limit FPS. ASSUMPTION: this is per-frame device
    # compute (scan-chained, single readback); the V100 baseline (51.4) was
    # an attached-GPU end-to-end measurement. On this harness the chip sits
    # behind a ~65 ms-RTT tunnel, so end-to-end numbers are link-bound —
    # reported separately as tunnel_sync_fps / tunnel_pipelined_fps.
    fps = 1000.0 / device_ms
    base = BASELINES.get(model_name, BASELINE_FPS)
    print(json.dumps({
        "metric": f"{model_name}_480p_{n_objects}obj_device_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3),
        # honest end-to-end ratio: best end-to-end mode measured in THIS
        # harness (chunked serving through the tunnel, every mask read
        # back) against the reference's attached-host end-to-end number
        "vs_baseline_e2e": round(chunked_fps / base, 3),
        "assumption": "device-limit FPS (attached-host projection), "
                      "scan over DISTINCT frames (constant-frame scans "
                      "hoist the image branch and inflate ~1.9x; rounds "
                      "1-3 had that artifact); baseline 51.4 was "
                      "attached-V100 end-to-end; tunnel-bound end-to-end "
                      "numbers reported alongside (vs_baseline_e2e keys "
                      "the best of those)",
        "device_ms_per_frame": round(device_ms, 3),
        "mfu": round(mfu, 4),
        "flops_per_frame": flops_per_frame,
        "kernels_ok": kernels_ok,
        "kernel_max_abs_err": kernel_errs,
        "tunnel_pipelined_fps": round(pipelined_fps, 2),
        "tunnel_sync_fps": round(sync_fps, 2),
        "tunnel_chunked_fps": round(chunked_fps, 2),
        "chunk_frames": chunk_k,
        **({"video_batch": video_batch,
            "video_batch_device_fps": round(vb_fps, 2),
            "video_batch_mfu": round(vb_mfu, 4)}
           if vb_fps else {}),
        **bf16_fields,
        **second_fields,
    }))


if __name__ == "__main__":
    main()
