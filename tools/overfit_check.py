"""Overfit-one-batch convergence diagnostic.

Pulls ONE real batch from the Static-pretrain pipeline and steps the full
jitted training step on it repeatedly. If model+loss+optimizer are sound,
IoU must race toward ~1.0 within a few hundred steps — this isolates the
training math from data-pipeline variance (the reference has no analogue;
it is the standard sanity check its 100k-step schedule never needed).

Usage:  cd <run_dir with datasets/Static>  &&  python tools/overfit_check.py
            [--steps 300] [--model aott] [--batch 4] [--no-jitter]
Prints one JSON line per log interval and a final verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--model", default="aott")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=257)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--log_step", type=int, default=25)
    ap.add_argument("--max_objs", type=int, default=0,
                    help="cap objects per sample (0 = leave as sampled)")
    ap.add_argument("--no_id_shuffle", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no_droppath", action="store_true")
    ap.add_argument("--batch_npz", default="",
                    help="load the fixed batch from this npz instead of "
                         "sampling (shared with tools/overfit_ref.py)")
    ap.add_argument("--dump_batch", default="",
                    help="save the sampled batch to this npz and exit")
    ap.add_argument("--stream_npz", default="",
                    help="npz of K pre-sampled batches (leading K axis), "
                         "cycled batches[step %% K] — the fixed data STREAM "
                         "for long-horizon convergence A/B vs overfit_ref")
    ap.add_argument("--dump_stream", type=int, default=0,
                    help="sample K batches from the pipeline, save to "
                         "--dump_batch path, and exit")
    ap.add_argument("--jsonl", default="", help="also append metrics here")
    ap.add_argument("--init_pth", default="",
                    help="torch state_dict to initialise from (converted "
                         "via utils/torch_import) — pairs with "
                         "overfit_ref.py --dump_init for a SAME-INIT "
                         "convergence A/B")
    ap.add_argument("--no_seq_freeze", action="store_true",
                    help="disable the step>=50%% id-bank seq-training "
                         "freeze (train/optim.py seq_on). The torch twin "
                         "holds use_prev_pred=False and freeze_params=[] "
                         "for ALL steps (the reference couples both to "
                         "the same step threshold, trainer.py:405-410) — "
                         "pass this for a symmetric same-init A/B")
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="relative init perturbation (e.g. 1e-7): a "
                         "CHAOS CONTROL for the convergence A/B — if the "
                         "same framework's trajectory diverges from its "
                         "own unperturbed twin as fast as it diverges "
                         "from the torch twin, curve gaps are Adam "
                         "trajectory chaos, not a dynamics bug")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (JAX_PLATFORMS env is not "
                         "enough under the axon plugin — the config key "
                         "is; same math, for tunnel-down A/B runs)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.train.trainer import Trainer
    from aot_tpu.data.loader import TrainLoader
    from aot_tpu.data.train_datasets import build_train_dataset
    from aot_tpu.parallel import shard_batch

    cfg = build_config(stage="pre", model=args.model, exp_name="overfit")
    cfg.TRAIN_BATCH_SIZE = args.batch
    cfg.DATA_RANDOMCROP = (args.crop, args.crop)
    cfg.TRAIN_LR = args.lr
    cfg.TRAIN_TOTAL_STEPS = args.steps
    cfg.DATA_WORKERS = 0
    cfg.TRAIN_AUTO_RESUME = False
    if args.no_droppath:
        cfg.TRAIN_LSTT_DROPPATH = 0.0
    if args.no_seq_freeze:
        cfg.TRAIN_SEQ_TRAINING_START_RATIO = 10.0  # never reached
    if args.fp32:
        cfg.TRAIN_DTYPE = "float32"
        cfg.TRAIN_MATMUL_PRECISION = "high"
    os.makedirs(cfg.DIR_CKPT, exist_ok=True)
    os.makedirs(cfg.DIR_LOG, exist_ok=True)

    import numpy as np

    def cap_objs(b):
        if args.max_objs <= 0:
            return b
        lab = np.asarray(b["labels"])
        return {"frames": b["frames"],
                "labels": np.where(lab <= args.max_objs, lab, 0),
                "obj_nums": np.minimum(np.asarray(b["obj_nums"]),
                                       args.max_objs)}

    if args.dump_stream > 0:
        dataset = build_train_dataset(cfg)
        loader = TrainLoader(dataset, cfg.TRAIN_BATCH_SIZE, num_workers=0,
                             seed=0)
        it = iter(loader)
        batches = [cap_objs(next(it)) for _ in range(args.dump_stream)]
        loader.close()
        np.savez(args.dump_batch,
                 **{k: np.stack([np.asarray(b[k]) for b in batches])
                    for k in ("frames", "labels", "obj_nums")})
        print(json.dumps({"dumped_stream": args.dump_batch,
                          "k": args.dump_stream}))
        return

    stream = None
    if args.stream_npz:
        d = np.load(args.stream_npz)
        stream = {k: d[k] for k in ("frames", "labels", "obj_nums")}
        batch = {k: v[0] for k, v in stream.items()}
    elif args.batch_npz:
        d = np.load(args.batch_npz)
        batch = {k: d[k] for k in ("frames", "labels", "obj_nums")}
    else:
        dataset = build_train_dataset(cfg)
        loader = TrainLoader(dataset, cfg.TRAIN_BATCH_SIZE, num_workers=0,
                             seed=0)
        batch = next(iter(loader))
        loader.close()
    if args.max_objs > 0:
        lab = np.asarray(batch["labels"])
        lab = np.where(lab <= args.max_objs, lab, 0)
        batch["labels"] = lab
        batch["obj_nums"] = np.minimum(
            np.asarray(batch["obj_nums"]), args.max_objs)
    if args.dump_batch:
        np.savez(args.dump_batch, **batch)
        print(json.dumps({"dumped": args.dump_batch,
                          "obj_nums": [int(x) for x in batch["obj_nums"]]}))
        return

    trainer = Trainer(cfg)
    if args.init_pth:
        # Same-init A/B: start from the torch twin's exact init weights so
        # any curve divergence is training DYNAMICS, not init RNG.
        from aot_tpu.parallel import replicate
        from aot_tpu.train import ema as ema_lib
        from aot_tpu.utils.torch_import import (convert_state_dict,
                                                load_state_dict)
        sd = load_state_dict(args.init_pth)  # numpy-valued, 'module.'-free
        params, missing, unexpected = convert_state_dict(
            sd, jax.device_get(trainer.state.params), cfg)
        if missing:
            raise SystemExit(f"init_pth missing keys: {missing[:8]}")
        params = replicate(trainer.mesh, params)
        trainer.state = trainer.state.replace(
            params=params,
            ema=(ema_lib.ema_init(params)
                 if trainer.state.ema is not None else None))
        print(json.dumps({"init_pth": args.init_pth,
                          "unexpected": len(unexpected)}), flush=True)
    if args.perturb > 0.0:
        import numpy as np  # noqa: F811 — local for clarity
        rng_p = np.random.RandomState(123)

        def _jitter(x):
            x = jax.device_get(x)
            return x * (1.0 + args.perturb * rng_p.standard_normal(x.shape)
                        .astype(np.float32))

        from aot_tpu.parallel import replicate
        from aot_tpu.train import ema as ema_lib
        pp = jax.tree.map(_jitter, jax.device_get(trainer.state.params))
        pp = replicate(trainer.mesh, pp)
        trainer.state = trainer.state.replace(
            params=pp,
            ema=(ema_lib.ema_init(pp)
                 if trainer.state.ema is not None else None))
        print(json.dumps({"perturb": args.perturb}), flush=True)
    if args.no_id_shuffle:
        from aot_tpu.train.step import make_train_step, shard_train_step
        trainer.train_step = shard_train_step(
            make_train_step(cfg, trainer.engine, enable_id_shuffle=False),
            trainer.mesh, cfg.MESH_DP_AXIS)

    def to_device(b):
        return (
            shard_batch(trainer.mesh, jnp.asarray(b["frames"]),
                        batch_axis=1, axis=cfg.MESH_DP_AXIS),
            shard_batch(trainer.mesh, jnp.asarray(b["labels"]),
                        batch_axis=1, axis=cfg.MESH_DP_AXIS),
            shard_batch(trainer.mesh, jnp.asarray(b["obj_nums"]),
                        batch_axis=0, axis=cfg.MESH_DP_AXIS),
        )

    frames, labels, obj_nums = to_device(batch)
    print(json.dumps({"obj_nums": [int(x) for x in batch["obj_nums"]]}),
          flush=True)
    jf = open(args.jsonl, "a") if args.jsonl else None

    rng = jax.random.PRNGKey(7)
    state = trainer.state
    t0 = time.time()
    last_iou = 0.0
    k_stream = stream["frames"].shape[0] if stream is not None else 1
    for step in range(1, args.steps + 1):
        if stream is not None:
            i = (step - 1) % k_stream
            frames, labels, obj_nums = to_device(
                {k: v[i] for k, v in stream.items()})
        rng, sub = jax.random.split(rng)
        state, stats = trainer.train_step(
            state, frames, labels, obj_nums, sub, False)
        if step % args.log_step == 0 or step == args.steps:
            s = jax.device_get(stats)
            last_iou = float(s["iou"])
            rec = {
                "step": step,
                "loss": round(float(s["loss"]), 4),
                "iou": round(last_iou, 4),
                "grad": round(float(s["grad_norm"]), 3),
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
