"""Evaluator: fully-online frame-by-frame multi-object VOS inference
(reference: networks/managers/evaluator.py).

Per video and TTA variant (scale x flip) an independent EngineState runs;
per frame:
  propagate -> decode logits at the ORIGINAL resolution -> (unflip) ->
  softmax; TTA-mean -> argmax = prediction; ground-truth labels arriving
  mid-video overwrite the prediction and re-reference all variants
  (evaluator.py:363-399); otherwise each variant's own label (nearest-
  downsampled to its input size) is written into memory.

TPU specifics: the heavy propagate+decode graph is jitted per (input size,
group count); the orig-size upsample+argmax is a separate small jit so
per-video original sizes don't retrace the big graph. Mask PNGs are written
by background threads; prediction fetches are async.
"""

from __future__ import annotations

import copy
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aot_tpu.data.eval_datasets import build_eval_dataset
from aot_tpu.data.video_aug import multi_restrict_size
from aot_tpu.engine import build_infer_engine
from aot_tpu.ops.image import (interpolate_bilinear, interpolate_nearest,
                               pack_labels_4bit, unpack_labels_4bit_np)
from aot_tpu.utils.eval_pack import zip_folder
from aot_tpu.utils.image import save_mask_async


class Evaluator:
    """Single-process evaluator driving one accelerator; sequences can be
    sharded over multiple processes via (rank, world) (the reference uses an
    mp.Queue, evaluator.py:216-235; static striding is equivalent for a
    fixed worker pool)."""

    def __init__(self, cfg, model, params, rank: int = 0, world: int = 1,
                 result_root: Optional[str] = None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.rank = rank
        self.world = world
        self.engine = build_infer_engine(model, cfg)
        self.result_root = result_root
        self._jit_cache: Dict = {}

    # --- jitted pieces (cached per shape signature) -----------------------
    def _fn(self, name, *key, builder=None):
        k = (name,) + key
        if k not in self._jit_cache:
            self._jit_cache[k] = builder()
        return self._jit_cache[k]

    def _make_prop_decode(self, flip: bool):
        eng = self.engine

        def fn(params, state, img, orig_size):
            state = eng.propagate(params, state, img)
            logits = eng.decode_logits(params, state, output_size=None)
            logits = interpolate_bilinear(
                logits, orig_size, align_corners=eng.engine.align_corners)
            if flip:
                logits = jnp.flip(logits, axis=2)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return state, prob

        return jax.jit(fn, static_argnames=("orig_size",))

    def _make_add_ref(self):
        eng = self.engine

        def fn(params, img, label_orig, obj_num, input_size):
            lab = interpolate_nearest(
                label_orig[..., None].astype(jnp.float32), input_size)
            lab = lab[..., 0].astype(jnp.int32)
            return eng.add_reference_frame(params, img, lab, obj_num)

        return jax.jit(fn, static_argnames=("obj_num", "input_size"))

    def _make_re_ref(self):
        eng = self.engine

        def fn(params, state, img, label_orig, obj_num, input_size,
               frame_step):
            lab = interpolate_nearest(
                label_orig[..., None].astype(jnp.float32), input_size)
            lab = lab[..., 0].astype(jnp.int32)
            st = eng.add_reference_frame(params, img, lab, obj_num,
                                         state=state, frame_step=frame_step)
            return st

        return jax.jit(fn, static_argnames=("obj_num", "input_size",
                                            "frame_step"))

    def _make_update(self):
        eng = self.engine

        def fn(params, state, label_orig, input_size):
            lab = interpolate_nearest(
                label_orig[..., None].astype(jnp.float32), input_size)
            lab = lab[..., 0].astype(jnp.int32)
            return eng.update_memory(params, state, lab)

        return jax.jit(fn, static_argnames=("input_size",))

    def _make_step_chunk(self, k: int, pack: bool = False):
        """K-frame single-dispatch stepping (engine.step_chunk): one upload
        of K frames, one download of K masks — amortises host<->device
        latency over label-free stretches. Single-variant (no TTA) only.
        pack=True additionally 4-bit-packs the K masks on device (valid for
        <= 15 ids), halving the mandatory downlink bytes per chunk."""
        eng = self.engine

        def fn(params, state, imgs, orig_size, input_size):
            state, preds = eng.step_chunk(params, state, imgs, orig_size,
                                          input_size)
            if pack:
                preds = pack_labels_4bit(preds)
            return state, preds

        return jax.jit(fn, static_argnames=("orig_size", "input_size"))

    def _make_update_prob(self):
        """MODEL_USE_PREV_PROB: write soft probabilities instead of hard
        labels into memory (reference: evaluator.py:428-446)."""
        eng = self.engine
        max_obj = self.engine.max_obj_num

        def fn(params, state, prob_orig, input_size):
            # prob_orig: (1, H, W, 1 + G*M) aggregated; regroup per engine
            g = state.batch
            p = interpolate_nearest(prob_orig, input_size)
            fg = p[..., 1:]
            groups = []
            for gi in range(g):
                sl = fg[..., gi * max_obj:(gi + 1) * max_obj]
                bg = 1.0 - jnp.sum(sl, axis=-1, keepdims=True)
                groups.append(jnp.concatenate([bg, sl], axis=-1))
            prob = jnp.concatenate(groups, axis=0)
            return eng.engine.update_memory(params, state, prob=prob)

        return jax.jit(fn, static_argnames=("input_size",))

    def _emit_mask(self, seq, result_dir, pending_writes,
                   mask_np: np.ndarray, meta: Dict) -> None:
        fname = os.path.splitext(meta["current_name"])[0] + ".png"
        out_path = os.path.join(result_dir, fname)
        squeeze_idx = meta.get("obj_idx")
        pending_writes.append(
            save_mask_async(mask_np.astype(np.uint8), out_path,
                            list(squeeze_idx) if squeeze_idx else None))
        # dense (all-frames) eval also exports the sparse 6fps subset
        # for the submission server (reference: evaluator.py:457-477)
        images_sparse = getattr(seq, "images_sparse", None)
        if images_sparse and meta["current_name"] in images_sparse:
            sparse_dir = (self.result_root or ".").rstrip("/") + "_sparse"
            os.makedirs(os.path.join(sparse_dir, seq.seq_name),
                        exist_ok=True)
            pending_writes.append(save_mask_async(
                mask_np.astype(np.uint8),
                os.path.join(sparse_dir, seq.seq_name, fname),
                list(squeeze_idx) if squeeze_idx else None))

    # --- batched multi-video serving --------------------------------------
    def _batchable(self, seq) -> bool:
        """Eligible for step_videos: single-variant hard-label eval and all
        objects annotated at frame 0 (mid-stream arrivals re-reference one
        video while others propagate — those take the scalar path)."""
        cfg = self.cfg
        if (len(cfg.TEST_MULTISCALE) != 1 or cfg.TEST_FLIP
                or cfg.MODEL_USE_PREV_PROB):
            return False
        labels = list(getattr(seq, "labels", ()))
        return (len(labels) == 1 and
                os.path.splitext(seq.images[0])[0] + ".png" in labels)

    def eval_sequences_batched(self, seqs) -> List[Dict]:
        """Advance N videos one frame per dispatch (engine.step_videos).
        All must share the same original and snapped input size (the caller
        buckets); ragged lengths replay the last frame of finished videos
        and discard those outputs. Per video the masks are identical to
        eval_sequence's scalar path (tests/test_video_batch.py)."""
        cfg = self.cfg
        params = self.params
        n = len(seqs)
        scales = list(cfg.TEST_MULTISCALE)

        def snap(image, label=None):
            return multi_restrict_size(
                image, label, multi_scale=scales, flip=False,
                max_short_edge=cfg.TEST_MAX_SHORT_EDGE,
                max_long_edge=cfg.TEST_MAX_LONG_EDGE,
                align_corners=cfg.MODEL_ALIGN_CORNERS)[0]

        firsts = [seq[0] for seq in seqs]
        metas = [s["meta"] for s in firsts]
        orig_size = (metas[0]["height"], metas[0]["width"])
        v0 = [snap(s["image"]) for s in firsts]
        input_size = v0[0]["image"].shape[:2]
        assert all((m["height"], m["width"]) == orig_size for m in metas)
        assert all(v["image"].shape[:2] == input_size for v in v0)

        result_dirs = []
        for seq in seqs:
            d = os.path.join(self.result_root or ".", seq.seq_name)
            os.makedirs(d, exist_ok=True)
            result_dirs.append(d)
        pending_writes: List = []

        obj_nums = [int(m["obj_num"]) for m in metas]
        imgs0 = jnp.asarray(np.stack([v["image"] for v in v0]))
        labels0 = jnp.asarray(
            np.stack([s["label"] for s in firsts]).astype(np.int32))

        add_refs = self._fn(
            "add_refs_videos", n, tuple(obj_nums), tuple(input_size),
            builder=lambda: jax.jit(
                lambda p, i, l: self.engine.add_reference_frames_videos(
                    p, i,
                    interpolate_nearest(
                        l[..., None].astype(jnp.float32),
                        input_size)[..., 0].astype(jnp.int32),
                    obj_nums)))
        state = add_refs(params, imgs0, labels0)
        shadow = self.engine.make_shadow()
        shadow.add_ref(0)

        step_v = self._fn(
            "step_videos", n, builder=lambda: jax.jit(
                lambda p, s, i, orig, inp: self.engine.step_videos(
                    p, s, i, orig_size=orig, input_size=inp),
                static_argnames=("orig", "inp")))

        lens = [len(seq) for seq in seqs]
        frame_times = [[] for _ in range(n)]
        last_imgs = [v["image"] for v in v0]
        for t in range(1, max(lens)):
            t0 = time.perf_counter()
            batch, metas_t = [], {}
            for vi, seq in enumerate(seqs):
                if t < lens[vi]:
                    sample = seq[t]
                    last_imgs[vi] = snap(sample["image"])["image"]
                    metas_t[vi] = sample["meta"]
                batch.append(last_imgs[vi])
            if shadow.will_write(t):
                state = self.engine.ensure_lt_capacity(
                    state, shadow.count + 1)
            state, preds = step_v(params, state, jnp.asarray(np.stack(batch)),
                                  tuple(orig_size), tuple(input_size))
            shadow.update(t)
            preds_np = np.asarray(
                jax.device_get(preds.astype(jnp.uint8)))  # (N, H, W)
            dt = time.perf_counter() - t0
            for vi, meta in metas_t.items():
                frame_times[vi].append(dt / max(1, len(metas_t)))
                self._emit_mask(seqs[vi], result_dirs[vi], pending_writes,
                                preds_np[vi], meta)

        for th in pending_writes:
            th.join()
        stats = []
        for vi, seq in enumerate(seqs):
            total = sum(frame_times[vi]) or 1e-9
            stats.append({
                "seq_name": seq.seq_name,
                "frames": lens[vi],
                "timed_frames": len(frame_times[vi]),
                "time": total,
                "fps": len(frame_times[vi]) / total,
            })
        return stats

    # --- per-video loop ------------------------------------------------------
    def eval_sequence(self, seq) -> Dict:
        cfg = self.cfg
        params = self.params
        scales = list(cfg.TEST_MULTISCALE)
        use_flip = cfg.TEST_FLIP

        states: List = [None] * (len(scales) * (2 if use_flip else 1))
        flips: List[bool] = []
        input_sizes: List[Tuple[int, int]] = []
        pending_writes = []
        obj_num = 0
        frame_times = []
        result_dir = os.path.join(self.result_root or ".", seq.seq_name)
        os.makedirs(result_dir, exist_ok=True)

        prop_fns = {}
        add_ref = self._fn("add_ref", builder=self._make_add_ref)
        re_ref = self._fn("re_ref", builder=self._make_re_ref)
        update = self._fn("update", builder=self._make_update)
        # host mirror of the LT write schedule: grows the ring just in time,
        # giving the reference's unbounded memory (aot_engine.py:291-305)
        # without per-frame device syncs
        shadow = self.engine.make_shadow()

        def emit_mask(mask_np: np.ndarray, meta: Dict):
            fname = os.path.splitext(meta["current_name"])[0] + ".png"
            out_path = os.path.join(result_dir, fname)
            squeeze_idx = meta.get("obj_idx")
            pending_writes.append(
                save_mask_async(mask_np.astype(np.uint8), out_path,
                                list(squeeze_idx) if squeeze_idx else None))
            # dense (all-frames) eval also exports the sparse 6fps subset
            # for the submission server (reference: evaluator.py:457-477)
            images_sparse = getattr(seq, "images_sparse", None)
            if images_sparse and meta["current_name"] in images_sparse:
                sparse_dir = (self.result_root or ".").rstrip("/") + "_sparse"
                os.makedirs(os.path.join(sparse_dir, seq.seq_name),
                            exist_ok=True)
                pending_writes.append(save_mask_async(
                    mask_np.astype(np.uint8),
                    os.path.join(sparse_dir, seq.seq_name, fname),
                    list(squeeze_idx) if squeeze_idx else None))

        # chunked stepping (TEST_FRAME_CHUNK > 1): label-free runs of >= 2
        # frames go through engine.step_chunk — K frames per dispatch, K
        # masks per readback. Single-variant hard-label mode only; chunk
        # sizes are powers of two so at most log2(chunk_max) traces exist.
        chunk_max = int(cfg.get("TEST_FRAME_CHUNK", 1))
        chunkable = (chunk_max > 1 and len(scales) == 1 and not use_flip
                     and not cfg.MODEL_USE_PREV_PROB)

        def has_label(i: int) -> bool:
            return (os.path.splitext(seq.images[i])[0] + ".png"
                    in getattr(seq, "labels", ()))

        frame_idx = 0
        while frame_idx < len(seq):
            if chunkable and frame_idx > 0:
                run = 0
                while (run < chunk_max and frame_idx + run < len(seq)
                       and not has_label(frame_idx + run)):
                    run += 1
                k = 1 << (run.bit_length() - 1) if run > 0 else 0
                if k >= 2:
                    chunk_samples = [seq[frame_idx + j] for j in range(k)]
                    m0 = chunk_samples[0]["meta"]
                    t0 = time.perf_counter()
                    imgs = np.stack([
                        multi_restrict_size(
                            s["image"], None, multi_scale=scales, flip=False,
                            max_short_edge=cfg.TEST_MAX_SHORT_EDGE,
                            max_long_edge=cfg.TEST_MAX_LONG_EDGE,
                            align_corners=cfg.MODEL_ALIGN_CORNERS,
                        )[0]["image"][None]
                        for s in chunk_samples])
                    # pre-grow the LT ring for every write in the chunk
                    # (the write schedule is host-deterministic)
                    sh = copy.copy(shadow)
                    for j in range(k):
                        sh.update(frame_idx + j)
                    states[0] = self.engine.ensure_lt_capacity(
                        states[0], sh.count)
                    pack = obj_num <= 15
                    step_c = self._fn(
                        "chunk", k, pack,
                        builder=lambda: self._make_step_chunk(k, pack))
                    states[0], preds = step_c(
                        params, states[0], jnp.asarray(imgs),
                        (m0["height"], m0["width"]),
                        tuple(input_sizes[0]))
                    preds_np = np.asarray(
                        jax.device_get(preds))  # (K, 1, H, W[/2]) uint8
                    if pack:
                        preds_np = unpack_labels_4bit_np(
                            preds_np, m0["width"])
                    dt = time.perf_counter() - t0
                    frame_times.extend([dt / k] * k)
                    for j, s in enumerate(chunk_samples):
                        shadow.update(frame_idx + j)
                        emit_mask(preds_np[j, 0], s["meta"])
                    frame_idx += k
                    continue

            sample = seq[frame_idx]
            image = sample["image"]
            label = sample["label"]
            meta = sample["meta"]
            orig_size = (meta["height"], meta["width"])

            variants = multi_restrict_size(
                image, label, multi_scale=scales, flip=use_flip,
                max_short_edge=cfg.TEST_MAX_SHORT_EDGE,
                max_long_edge=cfg.TEST_MAX_LONG_EDGE,
                align_corners=cfg.MODEL_ALIGN_CORNERS)

            if frame_idx == 0:
                obj_num = int(meta["obj_num"])
                flips = [v["flip"] for v in variants]
                input_sizes = [v["image"].shape[:2] for v in variants]
                lab = jnp.asarray(label[None].astype(np.int32))
                for vi, v in enumerate(variants):
                    img = jnp.asarray(v["image"][None])
                    vlab = jnp.flip(lab, axis=2) if v["flip"] else lab
                    states[vi] = add_ref(params, img, vlab, obj_num,
                                         tuple(input_sizes[vi]))
                shadow.add_ref(0)
                frame_idx += 1
                continue

            t0 = time.perf_counter()
            probs = []
            for vi, v in enumerate(variants):
                key = ("pd", flips[vi], tuple(input_sizes[vi]))
                if key not in prop_fns:
                    prop_fns[key] = self._make_prop_decode(flips[vi])
                img = jnp.asarray(v["image"][None])
                states[vi], prob = prop_fns[key](
                    params, states[vi], img, orig_size)
                probs.append(prob)

            mean_prob = probs[0] if len(probs) == 1 else (
                sum(probs) / len(probs))
            pred_label = jnp.argmax(mean_prob, axis=-1).astype(jnp.int32)
            per_variant_labels = (
                [pred_label] if len(probs) == 1 else
                [jnp.argmax(p, axis=-1).astype(jnp.int32) for p in probs])

            new_label = label  # GT arriving mid-video (unflipped variant)
            if new_label is not None:
                gt = jnp.asarray(new_label[None].astype(np.int32))
                keep = gt == 0
                pred_label = jnp.where(keep, pred_label, gt)
                per_variant_labels = [jnp.where(keep, l, gt)
                                      for l in per_variant_labels]
                obj_num = int(jax.device_get(jnp.max(pred_label)))
                needed = shadow.count + 1
                for vi in range(len(variants)):
                    lab_v = per_variant_labels[min(vi, len(per_variant_labels) - 1)]
                    if flips[vi]:
                        lab_v = jnp.flip(lab_v, axis=2)
                    st = self.engine.ensure_lt_capacity(states[vi], needed)
                    st = re_ref(params, st,
                                jnp.asarray(variants[vi]["image"][None]),
                                lab_v, obj_num,
                                tuple(input_sizes[vi]), frame_idx)
                    # the reference also refreshes short-term memory with the
                    # merged label right after re-referencing
                    # (evaluator.py:397-399)
                    states[vi] = update(params, st, lab_v,
                                        tuple(input_sizes[vi]))
                shadow.add_ref(frame_idx)
                shadow.update(frame_idx)
            elif self.cfg.MODEL_USE_PREV_PROB:
                upd_prob = self._fn("update_prob",
                                    builder=self._make_update_prob)
                needed = shadow.count + 1
                for vi in range(len(variants)):
                    p = probs[min(vi, len(probs) - 1)]
                    if flips[vi]:
                        p = jnp.flip(p, axis=2)
                    if shadow.will_write(frame_idx):
                        states[vi] = self.engine.ensure_lt_capacity(
                            states[vi], needed)
                    states[vi] = upd_prob(params, states[vi], p,
                                          tuple(input_sizes[vi]))
                shadow.update(frame_idx)
            else:
                needed = shadow.count + 1
                for vi in range(len(variants)):
                    lab_v = per_variant_labels[min(vi, len(per_variant_labels) - 1)]
                    if flips[vi]:
                        lab_v = jnp.flip(lab_v, axis=2)
                    if shadow.will_write(frame_idx):
                        states[vi] = self.engine.ensure_lt_capacity(
                            states[vi], needed)
                    states[vi] = update(params, states[vi], lab_v,
                                        tuple(input_sizes[vi]))
                shadow.update(frame_idx)

            # fetch as uint8: the axon tunnel's int32 downlink is ~100x
            # slower than uint8 for large arrays (mask ids always < 256)
            pred_u8 = pred_label.astype(jnp.uint8)
            pred_u8.block_until_ready()
            frame_times.append(time.perf_counter() - t0)

            mask_np = np.asarray(jax.device_get(pred_u8))[0]
            emit_mask(mask_np, meta)
            frame_idx += 1

        for t in pending_writes:
            t.join()
        total = sum(frame_times) if frame_times else 1e-9
        return {
            "seq_name": seq.seq_name,
            "frames": len(seq),
            "timed_frames": len(frame_times),
            "time": total,
            "fps": len(frame_times) / total,
        }

    def evaluate(self) -> Dict:
        cfg = self.cfg
        dataset = build_eval_dataset(cfg, result_root=self.result_root)
        stats = []
        t_start = time.time()
        my_seqs = [dataset[i] for i in range(len(dataset))
                   if i % self.world == self.rank]

        vb = int(cfg.get("TEST_VIDEO_BATCH", 1))
        scalar_seqs = list(my_seqs)
        if vb > 1:
            # bucket batchable videos by (orig size, snapped input size);
            # sort by length so ragged tails waste little compute
            buckets: Dict[Tuple, List] = {}
            scalar_seqs = []
            max_obj = self.engine.max_obj_num
            for seq in my_seqs:
                obj0 = (seq.obj_nums[0]
                        if getattr(seq, "obj_nums", None) else max_obj + 1)
                if not (self._batchable(seq) and obj0 <= max_obj):
                    scalar_seqs.append(seq)
                    continue
                m = seq[0]["meta"]
                buckets.setdefault((m["height"], m["width"]), []).append(seq)
            for key, group in buckets.items():
                group.sort(key=len)
                while group:
                    chunk, group = group[:vb], group[vb:]
                    if len(chunk) == 1:
                        scalar_seqs.extend(chunk)
                        continue
                    for s in self.eval_sequences_batched(chunk):
                        stats.append(s)
                        print(f"[eval rank {self.rank}] {s['seq_name']}: "
                              f"{s['timed_frames']} frames, "
                              f"{s['fps']:.1f} FPS (batched x{len(chunk)})")

        for seq in scalar_seqs:
            s = self.eval_sequence(seq)
            stats.append(s)
            print(f"[eval rank {self.rank}] {s['seq_name']}: "
                  f"{s['timed_frames']} frames, {s['fps']:.1f} FPS")
        total_time = sum(s["time"] for s in stats) or 1e-9
        total_frames = sum(s["timed_frames"] for s in stats)
        summary = {
            "sequences": len(stats),
            "total_frames": total_frames,
            "fps": total_frames / total_time,
            "wall_time": time.time() - t_start,
        }
        print(f"[eval rank {self.rank}] done: {summary}")
        return summary

    def package_submission(self, zip_path: str) -> None:
        """Zip Annotations for the benchmark server
        (reference: evaluator.py:538-542)."""
        zip_folder(self.result_root, zip_path)
