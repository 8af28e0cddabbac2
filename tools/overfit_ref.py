"""Torch-reference twin of tools/overfit_check.py.

Runs the REFERENCE trainer math (AOTEngine.forward + AdamW param groups +
clip + poly-warmup LR, reference: networks/managers/trainer.py:455-505) on
the same fixed batch dumped by `overfit_check.py --dump_batch`, so the two
frameworks' convergence behaviour can be compared step for step. CPU torch.

Usage: python tools/overfit_ref.py --batch_npz /tmp/batch.npz [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REF)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_npz", required=True)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--model", default="aott")
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--log_step", type=int, default=25)
    ap.add_argument("--id_shuffle", action="store_true")
    ap.add_argument("--no_droppath", action="store_true")
    ap.add_argument("--stream", action="store_true",
                    help="batch_npz holds K batches (leading K axis), "
                         "cycled batches[step %% K] — must match "
                         "overfit_check.py --stream_npz")
    ap.add_argument("--jsonl", default="", help="also append metrics here")
    ap.add_argument("--dump_init", default="",
                    help="save the freshly-initialised state_dict here "
                         "(for a SAME-INIT A/B via overfit_check.py "
                         "--init_pth), then continue training")
    ap.add_argument("--load_init", default="",
                    help="load this state_dict before training")
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.manual_seed(0)
    from tests.test_torch_parity import _fixed_v3_forward
    import networks.layers.attention as ref_att

    ref_att.MultiheadLocalAttentionV3.forward = _fixed_v3_forward

    from configs.default import DefaultEngineConfig
    import networks.models as ref_models
    from networks.engines import build_engine as ref_build_engine
    from utils.learning import adjust_learning_rate, get_trainable_params

    def np_mean_iou(pred, target, obj_nums, eps=1e-6):
        """Clean per-object IoU (same math as aot_tpu.ops.losses.mean_iou);
        the reference's pytorch_iou broadcasts (1,1,h,w)==(k,1,1) into a
        (1,k,h,w) tensor and then sums dims (1,2) — a shape-dependent
        reduction that is not comparable across harnesses."""
        vals = []
        for i in range(pred.shape[0]):
            n = int(obj_nums[i])
            if n == 0:
                continue
            ious = []
            for o in range(1, n + 1):
                p = pred[i] == o
                t = target[i] == o
                inter = float(np.logical_and(p, t).sum())
                union = float(np.logical_or(p, t).sum())
                ious.append((inter + eps) / (union + eps))
            vals.append(sum(ious) / len(ious))
        return sum(vals) / len(vals) if vals else 1.0

    cfg = DefaultEngineConfig("overfit_ref", args.model)
    cfg.TRAIN_TOTAL_STEPS = args.steps
    if args.no_droppath:
        cfg.TRAIN_LSTT_DROPPATH = 0.0

    model = ref_models.build_vos_model(cfg.MODEL_VOS, cfg)
    if args.load_init:
        model.load_state_dict(torch.load(args.load_init,
                                         map_location="cpu"))
    if args.dump_init:
        torch.save(model.state_dict(), args.dump_init)
        print(json.dumps({"dumped_init": args.dump_init}), flush=True)
    engine = ref_build_engine(
        cfg.MODEL_ENGINE, "train", aot_model=model, gpu_id=-1,
        long_term_mem_gap=cfg.TRAIN_LONG_TERM_MEM_GAP)
    engine.train()

    params = get_trainable_params(
        model=model, base_lr=args.lr,
        weight_decay=cfg.TRAIN_WEIGHT_DECAY,
        use_frozen_bn=cfg.MODEL_FREEZE_BN,
        exclusive_wd_dict=getattr(cfg, "TRAIN_WEIGHT_DECAY_EXCLUSIVE", {}),
        no_wd_keys=getattr(cfg, "TRAIN_WEIGHT_DECAY_EXEMPTION", []))
    opt = torch.optim.AdamW(params, lr=args.lr,
                            weight_decay=cfg.TRAIN_WEIGHT_DECAY)

    d = np.load(args.batch_npz)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)

    def prep(frames, labels, obj_nums_arr):
        t_len, bsz_, h, w, _ = frames.shape
        fr = (frames.astype(np.float32) / 255.0 - mean) / std
        tf_ = torch.from_numpy(
            fr.reshape(t_len * bsz_, h, w, 3).transpose(0, 3, 1, 2).copy())
        tm_ = torch.from_numpy(
            labels.astype(np.int64).reshape(t_len * bsz_, 1, h, w).copy())
        return tf_, tm_, [int(x) for x in obj_nums_arr], t_len, bsz_

    if args.stream:
        k_stream = d["frames"].shape[0]
        batches = [prep(d["frames"][i], d["labels"][i], d["obj_nums"][i])
                   for i in range(k_stream)]
        tf, tm, obj_nums, t_len, bsz = batches[0]
        labels_all = d["labels"]
    else:
        k_stream = 1
        batches = None
        tf, tm, obj_nums, t_len, bsz = prep(
            d["frames"], d["labels"], d["obj_nums"])
        labels_all = d["labels"][None]
    print(json.dumps({"obj_nums": obj_nums, "k": k_stream}), flush=True)
    jf = open(args.jsonl, "a") if args.jsonl else None

    t0 = time.time()
    last_iou = 0.0
    for step in range(1, args.steps + 1):
        i_b = (step - 1) % k_stream
        if batches is not None:
            tf, tm, obj_nums, t_len, bsz = batches[i_b]
        adjust_learning_rate(
            optimizer=opt, base_lr=args.lr, p=cfg.TRAIN_LR_POWER,
            itr=step, max_itr=args.steps, restart=1,
            warm_up_steps=int(cfg.TRAIN_LR_WARM_UP_RATIO * args.steps),
            is_cosine_decay=cfg.TRAIN_LR_COSINE_DECAY,
            min_lr=cfg.TRAIN_LR_MIN,
            encoder_lr_ratio=cfg.TRAIN_LR_ENCODER_RATIO,
            freeze_params=[])
        engine.restart_engine(bsz, args.id_shuffle)
        opt.zero_grad(set_to_none=True)
        loss, all_pred, all_loss, _ = engine(
            tf, tm.float(), bsz, obj_nums, step=step, use_prev_pred=False)
        loss = torch.mean(loss)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(),
                                       cfg.TRAIN_CLIP_GRAD_NORM)
        opt.step()
        if step % args.log_step == 0 or step == args.steps:
            with torch.no_grad():
                pred_np = all_pred[-1].detach().cpu().numpy()
                targ_np = labels_all[i_b][t_len - 1].astype(np.int64)
                last_iou = float(np_mean_iou(pred_np, targ_np, obj_nums))
            rec = {
                "step": step,
                "loss": round(float(loss.detach()), 4),
                "iou": round(last_iou, 4),
                "sec_per_it": round((time.time() - t0) / step, 3),
            }
            print(json.dumps(rec), flush=True)
            if jf:
                jf.write(json.dumps(rec) + "\n")
                jf.flush()
    if jf:
        jf.close()
    # calibration: from-scratch AOTT on a fixed 2-object batch reaches
    # ~0.38 IoU in 200 steps in BOTH this framework and the torch
    # reference (droppath keeps full memorisation away); the bar detects
    # broken-training regressions, not perfection
    verdict = "PASS" if last_iou > 0.25 else "FAIL"
    print(json.dumps({"verdict": verdict, "final_iou": last_iou}), flush=True)


if __name__ == "__main__":
    main()
