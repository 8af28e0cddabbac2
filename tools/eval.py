"""Evaluation CLI (reference: tools/eval.py — same argument surface)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    parser = argparse.ArgumentParser(description="Eval VOS (TPU)")
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--stage", type=str, default="pre_ytb_dav")
    parser.add_argument("--model", type=str, default="aott")
    parser.add_argument("--dataset", type=str, default="")
    parser.add_argument("--split", type=str, default="")
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--ckpt_step", type=int, default=-1)
    parser.add_argument("--ema", action="store_true", default=False)
    parser.add_argument("--flip", action="store_true")
    parser.add_argument("--ms", nargs="+", type=float, default=[1.0])
    parser.add_argument("--max_resolution", type=float, default=480 * 1.3)
    parser.add_argument("--amp", action="store_true", default=False,
                        help="bf16 inference (reference tools/eval.py:57 "
                             "autocast -> TEST_DTYPE=bfloat16)")
    parser.add_argument("--lstt_num", type=int, default=-1,
                        help="override MODEL_LSTT_NUM (reference "
                             "tools/eval.py:34,72-73)")
    parser.add_argument("--max_id_num", type=int, default=-1,
                        help="override MODEL_MAX_OBJ_NUM (reference "
                             "tools/eval.py:37,79-80)")
    parser.add_argument("--frame_chunk", type=int, default=-1,
                        help="frames stepped per device dispatch "
                             "(TEST_FRAME_CHUNK; >1 = chunked on-device "
                             "scan, single-scale no-flip eval only)")
    parser.add_argument("--video_batch", type=int, default=-1,
                        help="videos stepped together per device dispatch "
                             "(TEST_VIDEO_BATCH; >1 = batched multi-video "
                             "serving for single-scale no-flip eval of "
                             "frame-0-annotated videos)")
    parser.add_argument("--lt_gap", type=int, default=-1)
    parser.add_argument("--st_skip", type=int, default=-1)
    parser.add_argument("--mem_cap", type=int, default=-1)
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--world", type=int, default=1)
    return parser


def build_overrides(args):
    """Map CLI flags to config overrides (reference: tools/eval.py:57-99 —
    autocast/--amp, --lstt_num, --max_id_num, flip/ms/resolution knobs)."""
    over = {}
    if args.dataset:
        over["TEST_DATASET"] = args.dataset
    if args.split:
        over["TEST_DATASET_SPLIT"] = args.split
    if args.flip:
        over["TEST_FLIP"] = True
    if args.ms != [1.0]:
        over["TEST_MULTISCALE"] = args.ms
        # multiscale caps the short edge to prevent OOM (reference
        # tools/eval.py:96-99)
        over["TEST_MAX_SHORT_EDGE"] = args.max_resolution
    if args.amp:
        over["TEST_DTYPE"] = "bfloat16"
    if args.lstt_num > 0:
        over["MODEL_LSTT_NUM"] = args.lstt_num
    if args.max_id_num > 0:
        over["MODEL_MAX_OBJ_NUM"] = args.max_id_num
    if args.frame_chunk > 0:
        over["TEST_FRAME_CHUNK"] = args.frame_chunk
    if args.video_batch > 0:
        over["TEST_VIDEO_BATCH"] = args.video_batch
    if args.lt_gap > 0:
        over["TEST_LONG_TERM_MEM_GAP"] = args.lt_gap
    if args.st_skip > 0:
        over["TEST_SHORT_TERM_MEM_SKIP"] = args.st_skip
    if args.mem_cap > 0:
        over["TEST_LONG_TERM_MEM_CAP"] = args.mem_cap
    over["TEST_MAX_LONG_EDGE"] = args.max_resolution * 800 / 480
    return over


def main():
    args = build_parser().parse_args()

    from aot_tpu.configs import build_config

    over = build_overrides(args)
    cfg = build_config(stage=args.stage, model=args.model,
                       exp_name=args.exp_name, make_dirs=True, **over)

    from functools import partial

    import jax
    import jax.numpy as jnp

    from aot_tpu.models import build_vos_model
    from aot_tpu.utils import checkpoint as ckpt_lib
    from aot_tpu.utils.runtime import setup_runtime

    setup_runtime(matmul_precision=cfg.TEST_MATMUL_PRECISION)
    model = build_vos_model(cfg, eval_mode=True)
    h = w = 65
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    oh = jnp.zeros((1, h, w, cfg.MODEL_MAX_OBJ_NUM + 1),
                   jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img, oh)["params"]

    ckpt = None
    if args.ckpt_path == "test":
        print("[eval] ckpt-less smoke mode: random weights")
    else:
        ckpt_dir = cfg.DIR_EMA_CKPT if args.ema else cfg.DIR_CKPT
        ckpt = ckpt_lib.resolve_checkpoint(
            ckpt_dir, args.ckpt_path or None,
            args.ckpt_step if args.ckpt_step > 0 else None)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        if str(ckpt).endswith(".pth"):
            from aot_tpu.utils.torch_import import load_torch_pretrained

            params, _ = load_torch_pretrained(str(ckpt), params, cfg)
        else:
            params, _ = ckpt_lib.load_params_partial(str(ckpt), params)
        print(f"[eval] loaded {ckpt}")

    exp = f"{cfg.EXP_NAME}_{cfg.STAGE_NAME}_ckpt_{args.ckpt_step}"
    if args.ema:
        exp += "_ema"
    if args.flip:
        exp += "_flip"
    if args.ms != [1.0]:
        exp += "_ms_" + "_".join(str(s) for s in args.ms)
    result_root = os.path.join(cfg.DIR_EVALUATION, cfg.TEST_DATASET, exp,
                               "Annotations")
    os.makedirs(result_root, exist_ok=True)

    from aot_tpu.eval import Evaluator

    ev = Evaluator(cfg, model, params, rank=args.rank, world=args.world,
                   result_root=result_root)
    ev.evaluate()
    if args.rank == 0 and "youtubevos" in cfg.TEST_DATASET:
        zip_path = os.path.join(os.path.dirname(result_root),
                                "submission.zip")
        ev.package_submission(zip_path)
        print(f"[eval] packaged {zip_path}")


if __name__ == "__main__":
    main()
