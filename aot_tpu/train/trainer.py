"""Trainer: the full training loop (reference: networks/managers/trainer.py).

Single-process, multi-device: the batch is sharded over the mesh's data axis
(the reference spawns one DDP process per GPU; XLA's pjit data parallelism
replaces that). Covers: model/engine/optimizer/EMA construction, pretrained
init & auto-resume, the sequential-training curriculum, logging, and
checkpointing (raw + EMA streams).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aot_tpu.data.loader import TrainLoader
from aot_tpu.data.train_datasets import build_train_dataset
from aot_tpu.engine.train import build_train_engine
from aot_tpu.models import build_vos_model
from aot_tpu.parallel import make_mesh, replicate, shard_batch
from aot_tpu.train import ema as ema_lib
from aot_tpu.train.step import (create_train_state, make_train_step,
                                shard_train_step)
from aot_tpu.utils import checkpoint as ckpt_lib
from aot_tpu.utils.meters import AverageMeter
from aot_tpu.utils.runtime import setup_runtime


class Trainer:
    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        setup_runtime(matmul_precision=cfg.TRAIN_MATMUL_PRECISION)
        self.mesh = make_mesh(cfg.MESH_DP_SIZE, cfg.MESH_DP_AXIS)
        self.n_devices = self.mesh.devices.size
        if cfg.TRAIN_BATCH_SIZE % self.n_devices != 0:
            raise ValueError(
                f"batch {cfg.TRAIN_BATCH_SIZE} not divisible by "
                f"{self.n_devices} devices")
        self.seed = seed
        self.print_log(f"devices: {self.n_devices}, "
                       f"global batch: {cfg.TRAIN_BATCH_SIZE}")

        self.model = build_vos_model(cfg)
        self.engine = build_train_engine(self.model, cfg)
        self._init_params()
        # MODEL_FREEZE_BN=False: BN running stats live in batch_stats and
        # are EMA-updated from global-batch moments inside the train step
        # (SyncBN semantics via GSPMD; reference: trainer.py:66-67)
        self.state = create_train_state(cfg, self.params,
                                        batch_stats=self.batch_stats)
        self.state = replicate(self.mesh, self.state)
        self.train_step = shard_train_step(
            make_train_step(cfg, self.engine), self.mesh, cfg.MESH_DP_AXIS)

        self.start_step = 0
        self.process_pretrained_model()

    # ------------------------------------------------------------------
    def print_log(self, msg: str):
        print(f"[trainer] {msg}", flush=True)

    def _init_params(self):
        cfg = self.cfg
        h, w = cfg.DATA_RANDOMCROP
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        oh = jnp.zeros((1, h, w, cfg.MODEL_MAX_OBJ_NUM + 1),
                       jnp.float32).at[..., 0].set(1.0)
        variables = jax.jit(partial(self.model.init, deterministic=True))(
            jax.random.PRNGKey(self.seed), img, oh)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        n = sum(p.size for p in jax.tree.leaves(self.params))
        self.print_log(f"params: {n / 1e6:.2f}M")

    def process_pretrained_model(self):
        """Auto-resume > full pretrain > encoder-only pretrain
        (reference: trainer.py:136-256)."""
        cfg = self.cfg
        if cfg.TRAIN_AUTO_RESUME:
            latest = ckpt_lib.latest_checkpoint(cfg.DIR_CKPT)
            if latest is not None:
                self.state = ckpt_lib.load_pytree(latest, self.state)
                self.start_step = int(jax.device_get(self.state.step))
                self.print_log(f"auto-resumed {latest} @ {self.start_step}")
                return
        if cfg.TRAIN_RESUME and cfg.TRAIN_RESUME_CKPT:
            self.state = ckpt_lib.load_pytree(cfg.TRAIN_RESUME_CKPT, self.state)
            self.start_step = int(jax.device_get(self.state.step))
            return
        if cfg.PRETRAIN and cfg.PRETRAIN_MODEL:
            path = str(cfg.PRETRAIN_MODEL)
            if os.path.isdir(path):
                # stage chaining points at the previous stage's ema_ckpt
                # directory; resolve to its newest checkpoint
                resolved = ckpt_lib.latest_checkpoint(path)
                if resolved is None:
                    raise FileNotFoundError(
                        f"PRETRAIN_MODEL directory {path} has no "
                        "checkpoints — did the previous stage run?")
                path = resolved
            elif not os.path.exists(path):
                if cfg.PRETRAIN_FULL:
                    # a full-model chain (PRE -> PRE_YTB_DAV) must not
                    # silently train from scratch — the reference fails
                    # hard here too (trainer.py:248-256 load_network on a
                    # missing file)
                    raise FileNotFoundError(
                        f"PRETRAIN_MODEL {path} does not exist")
                # encoder-only ImageNet init is optional in this image
                self.print_log(
                    f"encoder pretrain {path} not found — random init")
                return
            if path.endswith(".pth"):
                from aot_tpu.utils.torch_import import load_torch_pretrained

                params, missing = load_torch_pretrained(
                    path, self.params, cfg,
                    encoder_only=not cfg.PRETRAIN_FULL)
            else:
                params, missing = ckpt_lib.load_params_partial(
                    path, self.params)
            self.state = self.state.replace(
                params=replicate(self.mesh, params),
                ema=ema_lib.ema_init(replicate(self.mesh, params)))
            self.print_log(f"loaded pretrain {path} "
                           f"({len(missing)} keys missing)")

    # ------------------------------------------------------------------
    def sequential_training(self, max_steps: Optional[int] = None):
        """(reference: trainer.py:356-593)."""
        cfg = self.cfg
        total = cfg.TRAIN_TOTAL_STEPS if max_steps is None else max_steps
        seq_start = int(cfg.TRAIN_SEQ_TRAINING_START_RATIO *
                        cfg.TRAIN_TOTAL_STEPS)

        dataset = build_train_dataset(cfg)
        loader = TrainLoader(dataset, cfg.TRAIN_BATCH_SIZE,
                             num_workers=cfg.DATA_WORKERS, seed=self.seed)
        rng = jax.random.PRNGKey(self.seed + 1)

        from aot_tpu.utils.logging import MetricsLogger

        metrics = MetricsLogger(cfg.DIR_LOG, tb=cfg.TRAIN_TBLOG)
        loss_meter = AverageMeter()
        iou_meter = AverageMeter()
        step = self.start_step
        t_last = time.time()
        data_iter = iter(loader)

        def to_device(batch):
            # async device_put: the next batch's transfer overlaps the
            # current step's execution
            return (
                shard_batch(self.mesh, jnp.asarray(batch["frames"]),
                            batch_axis=1, axis=cfg.MESH_DP_AXIS),
                shard_batch(self.mesh, jnp.asarray(batch["labels"]),
                            batch_axis=1, axis=cfg.MESH_DP_AXIS),
                shard_batch(self.mesh, jnp.asarray(batch["obj_nums"]),
                            batch_axis=0, axis=cfg.MESH_DP_AXIS),
            )

        debug_timing = bool(os.environ.get("AOT_TPU_DEBUG_TIMING"))
        host_batch = next(data_iter)
        next_dev = to_device(host_batch)
        while step < total:
            t0 = time.perf_counter()
            frames, labels, obj_nums = next_dev
            cur_host = host_batch
            use_prev_pred = step >= seq_start
            rng, sub = jax.random.split(rng)

            self.state, stats = self.train_step(
                self.state, frames, labels, obj_nums, sub, use_prev_pred)
            t1 = time.perf_counter()
            host_batch = next(data_iter)
            next_dev = to_device(host_batch)  # overlap with the step
            step += 1

            if cfg.TRAIN_IMG_LOG and step % cfg.TRAIN_TBLOG_STEP == 0:
                # (image | GT | pred) strip for sample 0's final frame
                # (reference: trainer.py:599-686)
                from aot_tpu.utils.logging import save_pred_image_log

                pred = np.asarray(
                    jax.device_get(stats["last_pred"]))[0]
                save_pred_image_log(
                    cfg.DIR_IMG_LOG, step,
                    np.asarray(cur_host["frames"][-1][0]),
                    np.asarray(cur_host["labels"][-1][0]), pred)
            if debug_timing:
                self.print_log(
                    f"  [timing] dispatch {t1 - t0:.3f}s "
                    f"load+put {time.perf_counter() - t1:.3f}s")

            if step % cfg.TRAIN_LOG_STEP == 0 or step == total:
                s = jax.device_get(stats)
                loss_meter.update(float(s["loss"]))
                iou_meter.update(float(s["iou"]))
                dt = time.time() - t_last
                eta_h = dt / cfg.TRAIN_LOG_STEP * (total - step) / 3600
                self.print_log(
                    f"step {step}/{total} loss {float(s['loss']):.4f} "
                    f"(avg {loss_meter.moving_avg:.4f}) "
                    f"iou {float(s['iou']):.4f} grad {float(s['grad_norm']):.2f} "
                    f"{dt / cfg.TRAIN_LOG_STEP:.2f}s/it eta {eta_h:.2f}h")
                metrics.log(step, {
                    "loss": float(s["loss"]),
                    "aux_loss": float(s["aux_loss"]),
                    "pred_loss": float(s["pred_loss"]),
                    "iou": float(s["iou"]),
                    "grad_norm": float(s["grad_norm"]),
                    "sec_per_it": dt / cfg.TRAIN_LOG_STEP,
                })
                t_last = time.time()

            if step % cfg.TRAIN_SAVE_STEP == 0 or step == total:
                self.save_checkpoints(step)

        loader.close()
        metrics.close()

    def save_checkpoints(self, step: int):
        """Raw + EMA streams (reference: trainer.py:553-591)."""
        cfg = self.cfg
        ckpt_lib.save_checkpoint(
            cfg.DIR_CKPT, step, self.state, max_keep=cfg.TRAIN_MAX_KEEP_CKPT,
            backup_dir=os.path.join("./backup", cfg.EXP_NAME, cfg.STAGE_NAME,
                                    "ckpt"))
        if self.state.ema is not None:
            ema_params = {"params": jax.device_get(self.state.ema.shadow)}
            if self.state.batch_stats is not None:
                # running stats ride along so eval can fold them into the
                # frozen-BN param layout (reference EMA optionally carries
                # BN buffers, utils/ema.py:7-19)
                ema_params["batch_stats"] = jax.device_get(
                    self.state.batch_stats)
            ckpt_lib.save_checkpoint(
                cfg.DIR_EMA_CKPT, step, ema_params,
                max_keep=cfg.TRAIN_MAX_KEEP_CKPT,
                backup_dir=os.path.join("./backup", cfg.EXP_NAME,
                                        cfg.STAGE_NAME, "ema_ckpt"))
        self.print_log(f"saved checkpoints @ {step}")
