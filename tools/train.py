"""Training CLI (reference: tools/train.py — same argument surface; one
process drives all local devices via the mesh instead of mp.spawn/DDP)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Train VOS (TPU)")
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--stage", type=str, default="pre")
    parser.add_argument("--model", type=str, default="aott")
    parser.add_argument("--gpu_num", type=int, default=-1,
                        help="devices in the mesh (-1 = all local)")
    parser.add_argument("--batch_size", type=int, default=-1)
    parser.add_argument("--total_steps", type=int, default=-1)
    parser.add_argument("--lr", type=float, default=-1.0)
    parser.add_argument("--pretrained_path", type=str, default="")
    parser.add_argument("--datasets", nargs="+", default=[])
    parser.add_argument("--data_workers", type=int, default=-1)
    parser.add_argument("--max_id_num", type=int, default=-1)
    parser.add_argument("--amp", action="store_true",
                        help="bf16 compute (default on TPU)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--log_step", type=int, default=-1)
    parser.add_argument("--save_step", type=int, default=-1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="raw config override (python literal value)")
    args = parser.parse_args()

    from aot_tpu.configs import build_config

    over = {}
    if args.gpu_num > 0:
        over["MESH_DP_SIZE"] = args.gpu_num
        over["TRAIN_GPUS"] = args.gpu_num
    if args.batch_size > 0:
        over["TRAIN_BATCH_SIZE"] = args.batch_size
    if args.total_steps > 0:
        over["TRAIN_TOTAL_STEPS"] = args.total_steps
    if args.lr > 0:
        over["TRAIN_LR"] = args.lr
    if args.pretrained_path:
        over["PRETRAIN_MODEL"] = args.pretrained_path
        over["PRETRAIN_FULL"] = True
    if args.datasets:
        over["DATASETS"] = args.datasets
    if args.data_workers >= 0:
        over["DATA_WORKERS"] = args.data_workers
    if args.max_id_num > 0:
        over["MODEL_MAX_OBJ_NUM"] = args.max_id_num
    if args.fp32:
        over["TRAIN_DTYPE"] = "float32"
    if args.log_step > 0:
        over["TRAIN_LOG_STEP"] = args.log_step
    if args.save_step > 0:
        over["TRAIN_SAVE_STEP"] = args.save_step
    import ast

    for kv in args.overrides:
        key, _, val = kv.partition("=")
        try:
            over[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            over[key] = val

    cfg = build_config(stage=args.stage, model=args.model,
                       exp_name=args.exp_name, make_dirs=True, **over)

    from aot_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, seed=args.seed)
    trainer.sequential_training()


if __name__ == "__main__":
    main()
