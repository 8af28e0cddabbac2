"""Training-time engine: the per-clip forward recipe
(reference: networks/engines/aot_engine.py:33-108 AOTEngine.forward).

Recipe for a T-frame clip (default T=5, reference DATA_SEQ_LEN):
  1. offline-encode all frames in one batched pass (aot_engine.py:147-166);
  2. seed memory from frame 0 + GT mask; auxiliary loss on frame 0;
  3. propagate frames 1..T-1; per-frame loss; between frames, write the
     short/long-term memory using the PREDICTED mask (self-distillation
     curriculum `use_prev_pred`) or the GT mask;
  4. loss = aux_weight(step) * aux + mean(frame losses)   (:97-100).

Pure function of (params, batch, step, rngs); identity shuffling
(aot_engine.py:168-179) enters via a per-sample permutation matrix.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aot_tpu.engine.engine import VOSEngine
from aot_tpu.ops import losses as loss_ops
from aot_tpu.ops.image import interpolate_bilinear_matmul_cf


def build_train_engine(model, cfg) -> "TrainEngine":
    """(reference: networks/engines/__init__.py build_engine('train'),
    trainer.py:48-53)."""
    return TrainEngine(
        model,
        max_obj_num=cfg.MODEL_MAX_OBJ_NUM,
        lt_gap=cfg.TRAIN_LONG_TERM_MEM_GAP,
        st_skip=1,
        lt_cap=cfg.TRAIN_LONG_TERM_MEM_CAP,
        lt_policy="fifo",
        align_corners=cfg.MODEL_ALIGN_CORNERS,
        total_steps=cfg.TRAIN_TOTAL_STEPS,
        aux_weight=cfg.TRAIN_AUX_LOSS_WEIGHT,
        aux_ratio=cfg.TRAIN_AUX_LOSS_RATIO,
        top_k_percent=cfg.TRAIN_TOP_K_PERCENT_PIXELS,
        hard_mining_ratio=cfg.TRAIN_HARD_MINING_RATIO,
        remat=cfg.get("TRAIN_REMAT", True),
        remat_policy=cfg.get("TRAIN_REMAT_POLICY", "nothing"),
    )


class TrainEngine(VOSEngine):
    """Adds the training forward to VOSEngine."""

    def __init__(self, *args, total_steps: int = 100_000,
                 aux_weight: float = 1.0, aux_ratio: float = 1.0,
                 top_k_percent: float = 0.15, hard_mining_ratio: float = 0.5,
                 remat: bool = True, remat_policy: str = "nothing", **kw):
        super().__init__(*args, **kw)
        self.total_steps = total_steps
        self.aux_weight = aux_weight
        self.aux_step = total_steps * aux_ratio + 1e-5
        self.top_k_percent = top_k_percent
        self.hard_mining_step = hard_mining_ratio * total_steps + 1e-5
        self.remat = remat
        self.remat_policy = remat_policy

    # --- helpers ---------------------------------------------------------
    def _id_emb(self, params, mask, shuffle_matrix, freeze_id, rngs,
                deterministic=False):
        label = mask
        if label.ndim == 4 and label.shape[-1] == 1:
            label = label[..., 0]
        label = label.astype(jnp.int32)
        if shuffle_matrix is not None:
            # shuffle matrices are permutations (generate_permute_matrix),
            # so one_hot(l) @ S == one_hot(perm[l]) — relabel instead of
            # matmul, keeping the id bank's fast label path applicable
            perm = jnp.argmax(shuffle_matrix, axis=2).astype(jnp.int32)
            b = label.shape[0]
            label = jnp.take_along_axis(
                perm, label.reshape(b, -1), axis=1).reshape(label.shape)
        emb = self.get_id_emb_label(params, label,
                                    deterministic=deterministic, rngs=rngs)
        if freeze_id:
            emb = jax.lax.stop_gradient(emb)
        return emb

    def _frame_loss(self, params, state, gt_mask, obj_nums, shuffle_matrix,
                    step, input_size, rngs):
        """decode -> (loss, pred_mask) at input resolution
        (reference: generate_loss_mask, aot_engine.py:421-429)."""
        logits = self._apply(
            params, type(self.model).decode_id_logits,
            state.embs, state.shortcuts, rngs=rngs)
        if shuffle_matrix is not None:  # reverse shuffle (aot_engine.py:363-365)
            logits = jnp.einsum("bhwo,bto->bhwt", logits, shuffle_matrix)
        ids = jnp.arange(self.max_obj_num + 1)[None, None, None, :]
        logits = jnp.where(ids <= obj_nums[:, None, None, None], logits, -1e10)
        # go channel-first at stride 4 (tiny transpose), THEN upsample: the
        # full-res loss ops vectorise over the (H, W) plane instead of the
        # 11-wide minor class axis (see combined_vos_loss_cf)
        logits_cf = jnp.transpose(logits, (0, 3, 1, 2))
        # matmul-form resize: differentiated here, and the gather form's
        # backward is a serialised scatter-add on TPU
        logits_cf = interpolate_bilinear_matmul_cf(
            logits_cf, input_size, align_corners=self.align_corners)
        ratio = jnp.minimum(1.0, step / self.hard_mining_step)
        loss = loss_ops.combined_vos_loss_cf(
            logits_cf, gt_mask, obj_nums,
            top_k_percent=self.top_k_percent, top_k_ratio=ratio)
        pred = jnp.argmax(logits_cf, axis=1).astype(jnp.int32)
        return loss, pred

    # --- the clip forward --------------------------------------------------
    def forward(
        self,
        params,
        frames: jax.Array,       # (T, B, H, W, 3)
        masks: jax.Array,        # (T, B, H, W) int
        obj_nums: jax.Array,     # (B,)
        step: jax.Array,         # () float/int — global training step
        *,
        shuffle_matrix: Optional[jax.Array] = None,  # (B, M+1, M+1)
        use_prev_pred: bool = False,
        enable_prev_frame: bool = False,
        rngs: Optional[Dict] = None,
        deterministic: bool = False,
        batch_stats: Optional[Dict] = None,  # MODEL_FREEZE_BN=False only
    ) -> Tuple[jax.Array, Dict]:
        # deterministic=True mirrors the reference engine under .eval()
        # (dropout/droppath off, losses still computed) — used by the
        # cross-framework parity tests; training runs use the default.
        t, b, h, w, _ = frames.shape
        step = jnp.asarray(step, jnp.float32)
        freeze_id = use_prev_pred

        # 1. offline encoder: all frames in one conv pass
        flat = frames.reshape(t * b, h, w, 3)
        new_batch_stats = None
        if batch_stats is not None:
            # trainable BN (MODEL_FREEZE_BN=False): normalise by CURRENT
            # batch moments and collect the EMA-updated running stats. The
            # moments are reductions over the logically-global (T*B) batch
            # axis, so under a batch-sharded mesh XLA inserts the
            # cross-replica collective — SyncBN semantics (reference:
            # trainer.py:66-67 convert_sync_batchnorm). BN exists only in
            # the encoders, so only this offline encode is threaded.
            xs, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, flat,
                method=type(self.model).encode_image,
                mutable=["batch_stats"])
            new_batch_stats = jax.tree.map(
                jax.lax.stop_gradient, mutated["batch_stats"])
        else:
            xs = self.encode_image(params, flat)
        ref_feats = [x.reshape((t, b) + x.shape[1:])[0] for x in xs]
        input_size = (h, w)

        # 2. reference frame
        # freeze_id applies to the reference frame too (reference sets
        # self.freeze_id before add_reference_frame, aot_engine.py:46,52)
        id_emb0 = self._id_emb(params, masks[0], shuffle_matrix,
                               freeze_id=freeze_id, rngs=rngs,
                               deterministic=deterministic)
        state = self.add_reference_frame(
            params, None, masks[0], obj_nums, img_embs=ref_feats,
            id_emb=id_emb0, deterministic=deterministic, rngs=rngs)
        aux_loss, aux_pred = self._frame_loss(
            params, state, masks[0], obj_nums, shuffle_matrix, step,
            input_size, rngs)
        aux_losses = [aux_loss]

        first_prop = 1
        if enable_prev_frame:
            # frame 1 is GT-seeded like a second reference (reference
            # set_prev_frame, aot_engine.py:253-289: appends LT memory,
            # resets the ST ring, aux loss on it)
            prev_feats = [x.reshape((t, b) + x.shape[1:])[1] for x in xs]
            id_emb1 = self._id_emb(params, masks[1], shuffle_matrix,
                                   freeze_id=freeze_id, rngs=rngs,
                                   deterministic=deterministic)
            state = self.add_reference_frame(
                params, None, masks[1], obj_nums, state=state,
                img_embs=prev_feats, id_emb=id_emb1, frame_step=1,
                deterministic=deterministic, rngs=rngs)
            prev_aux, _ = self._frame_loss(
                params, state, masks[1], obj_nums, shuffle_matrix, step,
                input_size, rngs)
            aux_losses.append(prev_aux)
            first_prop = 2

        # 3. propagate the remaining frames with inter-frame memory writes.
        # lax.scan over the frame axis: one traced body instead of T-1
        # unrolled copies (the reference's Python loop, aot_engine.py:86-95).
        feat_stacked = tuple(
            x.reshape((t, b) + x.shape[1:])[first_prop:] for x in xs)
        # no memory write before the first propagated frame
        not_first = jnp.arange(first_prop, t) > first_prop
        prev_gt = masks[first_prop - 1:t - 1]

        def body(carry, inp):
            st, prev_pred = carry
            feats, gt_mask, prev_gt_mask, do_update = inp

            def update(s):
                mem_mask = prev_pred if use_prev_pred else prev_gt_mask
                id_emb = self._id_emb(params, mem_mask, shuffle_matrix,
                                      freeze_id=freeze_id, rngs=rngs,
                                      deterministic=deterministic)
                return self.update_memory(params, s, id_emb=id_emb,
                                          deterministic=deterministic, rngs=rngs)

            st = jax.lax.cond(do_update, update, lambda s: s, st)
            st = self.propagate(params, st, None, img_embs=list(feats),
                                deterministic=deterministic, rngs=rngs)
            floss, pred = self._frame_loss(
                params, st, gt_mask, obj_nums, shuffle_matrix, step,
                input_size, rngs)
            return (st, pred), (floss, pred)

        # rematerialise per-frame propagation in the backward pass: without
        # it the 4-frame unrolled activations overflow HBM at batch >= 8
        # (trades ~1 extra forward for O(T) -> O(1) activation memory).
        # 'dots' keeps matmul/conv outputs resident (recomputes only the
        # cheap elementwise ops) — more HBM than full remat, less recompute.
        if self.remat:
            pol = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                   if self.remat_policy == "dots" else None)
            scan_body = jax.checkpoint(body, policy=pol)
        else:
            scan_body = body

        init_pred = jnp.zeros((b,) + input_size, jnp.int32)
        (state, last_pred), (frame_losses, _) = jax.lax.scan(
            scan_body, (state, init_pred),
            (feat_stacked, masks[first_prop:], prev_gt, not_first))

        pred_loss = jnp.mean(frame_losses)
        aux_mean = jnp.mean(jnp.stack([jnp.mean(a) for a in aux_losses]))
        aux_w = self.aux_weight * jnp.maximum(
            self.aux_step - step, 0.0) / self.aux_step
        total = aux_w * aux_mean + pred_loss

        iou = loss_ops.mean_iou(last_pred, masks[t - 1], obj_nums,
                                self.max_obj_num)
        stats = {
            "loss": total,
            "aux_loss": aux_mean,
            "pred_loss": pred_loss,
            "frame_losses": jnp.concatenate(
                [aux_mean[None], jnp.mean(frame_losses, axis=1)]),
            "iou": iou,
            # final-frame prediction, for TRAIN_IMG_LOG dumps (reference
            # logs pred-vs-GT images, trainer.py:599-686); stays on device
            # unless the trainer fetches it at a log step
            "last_pred": last_pred,
        }
        if new_batch_stats is not None:
            stats["batch_stats"] = new_batch_stats
        return total, stats
