"""Demo CLI: panoptic propagation on datasets/Demo with PNG masks + overlay
video (reference: tools/demo.py)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="VOS demo (TPU)")
    parser.add_argument("--model", type=str, default="aott")
    parser.add_argument("--ckpt_path", type=str, default="test",
                        help="'test' = random weights smoke mode")
    parser.add_argument("--data_path", type=str, default="./datasets/Demo")
    parser.add_argument("--output_path", type=str, default="./demo_output")
    parser.add_argument("--max_resolution", type=float, default=480)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--frame_chunk", type=int, default=1,
                        help=">1 = step K frames per device dispatch "
                             "(on-device mask feedback; masks identical "
                             "to per-frame stepping)")
    parser.add_argument("--no_video", action="store_true")
    args = parser.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aot_tpu.configs import build_config
    from aot_tpu.data.eval_datasets import DemoTest
    from aot_tpu.data.video_aug import multi_restrict_size
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.ops.image import interpolate_nearest
    from aot_tpu.utils.image import label2colormap, masked_image, save_mask_async
    from aot_tpu.utils.runtime import setup_runtime

    cfg = build_config(stage="pre_ytb_dav", model=args.model,
                       TEST_DTYPE="bfloat16" if args.amp else "float32")
    setup_runtime(matmul_precision=cfg.TEST_MATMUL_PRECISION)
    model = build_vos_model(cfg, eval_mode=True)

    img0 = jnp.zeros((1, 65, 65, 3), jnp.float32)
    oh0 = jnp.zeros((1, 65, 65, 11), jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(42), img0, oh0)["params"]
    if args.ckpt_path != "test":
        if args.ckpt_path.endswith(".pth"):
            from aot_tpu.utils.torch_import import load_torch_pretrained

            params, _ = load_torch_pretrained(args.ckpt_path, params, cfg)
        else:
            from aot_tpu.utils import checkpoint as ckpt_lib

            params, _ = ckpt_lib.load_params_partial(args.ckpt_path, params)
        print(f"loaded {args.ckpt_path}")
    else:
        print("random-weight smoke mode (pass --ckpt_path for real masks)")

    eng = build_infer_engine(model, cfg)
    dataset = DemoTest(args.data_path)

    add_ref = jax.jit(
        lambda p, i, m, n: eng.add_reference_frame(p, i, m, obj_num=n),
        static_argnums=(3,))

    def _step(p, s, i, output_size):
        return eng.step(p, s, i, output_size=output_size)

    step = jax.jit(_step, static_argnames=("output_size",), donate_argnums=(1,))

    # chunked stepping: decode at input size with identity nearest-resample
    # (orig_size == input_size), so memory updates are bit-identical to the
    # per-frame `eng.step` path; the full-resolution nearest upscale runs
    # on-device for the whole chunk in one extra dispatch
    step_chunk = jax.jit(
        lambda p, s, f, size: eng.step_chunk(p, s, f, size, size),
        static_argnames=("size",))
    up_chunk = jax.jit(
        lambda pr, size: interpolate_nearest(
            pr[:, 0, :, :, None].astype(jnp.float32),
            size)[..., 0].astype(jnp.uint8),
        static_argnames=("size",))

    for si in range(len(dataset)):
        seq = dataset[si]
        print(f"sequence {seq.seq_name}: {len(seq)} frames")
        out_mask_dir = os.path.join(args.output_path, seq.seq_name)
        os.makedirs(out_mask_dir, exist_ok=True)
        video_frames = []
        writes = []
        t0 = time.perf_counter()
        n_stepped = 0
        state = None

        def prep(sample):
            v = multi_restrict_size(
                sample["image"], sample["label"], multi_scale=[1.0],
                max_long_edge=args.max_resolution * 800 / 480,
                align_corners=cfg.MODEL_ALIGN_CORNERS)[0]
            return v["image"], v["image"].shape[:2]

        def emit(pred_np, sample):
            name = (os.path.splitext(sample["meta"]["current_name"])[0]
                    + ".png")
            writes.append(save_mask_async(pred_np,
                                          os.path.join(out_mask_dir, name)))
            if not args.no_video:
                image = sample["image"]
                overlay = masked_image(
                    image / 255.0, label2colormap(pred_np) / 255.0, pred_np)
                video_frames.append((overlay * 255).astype(np.uint8))

        fi = 0
        while fi < len(seq):
            sample = seq[fi]
            image, label = sample["image"], sample["label"]
            small, in_size = prep(sample)
            if fi == 0:
                lab = np.asarray(label, np.int32)[None]
                lab_small = interpolate_nearest(
                    jnp.asarray(lab, jnp.float32)[..., None],
                    in_size)[..., 0].astype(jnp.int32)
                obj_num = int(label.max())
                state = add_ref(params, jnp.asarray(small[None]), lab_small,
                                obj_num)
                emit(np.asarray(label, np.uint8), sample)
                fi += 1
                continue
            remaining = len(seq) - fi
            k = 1 << (min(max(args.frame_chunk, 1), remaining)
                      .bit_length() - 1)
            if k >= 2:
                samples = [sample] + [seq[fi + j] for j in range(1, k)]
                smalls = [small] + [prep(s)[0] for s in samples[1:]]
                imgs = np.stack([s[None] for s in smalls])
                state, preds = step_chunk(params, state, jnp.asarray(imgs),
                                          tuple(in_size))
                big = up_chunk(preds, tuple(image.shape[:2]))
                big_np = np.asarray(jax.device_get(big))
                for j, s in enumerate(samples):
                    emit(big_np[j], s)
                n_stepped += k
                fi += k
                continue
            state, pred, _ = step(params, state, jnp.asarray(small[None]),
                                  tuple(in_size))
            pred_big = interpolate_nearest(
                pred[..., None].astype(jnp.float32),
                image.shape[:2])[..., 0].astype(jnp.int32)
            pred_np = np.asarray(jax.device_get(pred_big))[0].astype(np.uint8)
            n_stepped += 1
            emit(pred_np, sample)
            fi += 1
        dt = time.perf_counter() - t0
        for t in writes:
            t.join()
        print(f"  {n_stepped / max(dt, 1e-9):.1f} FPS")
        if not args.no_video and video_frames:
            import cv2

            h, w = video_frames[0].shape[:2]
            vw = cv2.VideoWriter(
                os.path.join(args.output_path, seq.seq_name + ".avi"),
                cv2.VideoWriter_fourcc(*"MJPG"), 15, (w, h))
            for f in video_frames:
                vw.write(f[:, :, ::-1])
            vw.release()
    print(f"results saved to {args.output_path}")


if __name__ == "__main__":
    main()
