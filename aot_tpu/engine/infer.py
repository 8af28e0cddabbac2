"""VOSInferEngine: arbitrary object counts via ≤max_obj groups
(reference: networks/engines/aot_engine.py:485-635 AOTInferEngine).

Where the reference keeps a Python list of sub-engines and loops them, here
the group axis IS the engine's batch axis: the image is encoded once and the
embeddings broadcast over groups (the reference shares img_embs the same way,
aot_engine.py:606-616). Group count G is decided host-side per video; a
change of G retraces (rare — only when a video exceeds a multiple of
max_obj_num objects mid-stream).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aot_tpu.engine import state as S
from aot_tpu.engine.engine import VOSEngine
from aot_tpu.ops.image import (
    interpolate_bilinear,
    interpolate_nearest,
    upsample_argmax,
)


def groups_for(obj_num: int, max_obj_num: int) -> int:
    return max(1, math.ceil(obj_num / max_obj_num))


def separate_mask(mask: jax.Array, num_groups: int, max_obj_num: int) -> jax.Array:
    """(1, H, W) full-id mask -> (G, H, W) per-group masks with local ids
    1..max_obj_num (reference: aot_engine.py:515-545)."""
    g = jnp.arange(num_groups, dtype=mask.dtype)[:, None, None]
    start = g * max_obj_num + 1
    end = (g + 1) * max_obj_num
    m = mask.reshape(mask.shape[-2], mask.shape[-1])[None]
    fg = (m >= start) & (m <= end)
    return jnp.where(fg, m - start + 1, 0)


def separated_obj_nums(obj_num: int, num_groups: int, max_obj_num: int):
    nums = [max_obj_num] * num_groups
    if obj_num % max_obj_num > 0:
        nums[-1] = obj_num % max_obj_num
    return nums


def soft_aggregate_logits(group_logits: jax.Array, max_obj_num: int) -> jax.Array:
    """(G, H, W, M+1) -> (1, H, W, 1 + G*M) merged logits
    (reference: aot_engine.py:565-582): bg prob = product of per-group bg
    probs; fg probs concatenated; clamped logit."""
    g = group_logits.shape[0]
    if g == 1:
        return group_logits
    probs = jax.nn.softmax(group_logits.astype(jnp.float32), axis=-1)
    bg = jnp.prod(probs[..., 0], axis=0, keepdims=True)[..., None]  # (1,H,W,1)
    fg = jnp.concatenate(
        [probs[i:i + 1, ..., 1:1 + max_obj_num] for i in range(g)], axis=-1)
    merged = jnp.concatenate([bg, fg], axis=-1)
    merged = jnp.clip(merged, 1e-5, 1 - 1e-5)
    return jnp.log(merged) - jnp.log1p(-merged)  # logit()


def min_aggregate_logits(group_logits: jax.Array, max_obj_num: int) -> jax.Array:
    """(reference: aot_engine.py:547-563)."""
    g = group_logits.shape[0]
    if g == 1:
        return group_logits
    bg = jnp.min(group_logits[..., 0], axis=0, keepdims=True)[..., None]
    fg = jnp.concatenate(
        [group_logits[i:i + 1, ..., 1:1 + max_obj_num] for i in range(g)],
        axis=-1)
    return jnp.concatenate([bg, fg], axis=-1)


def _expand_groups(state: S.EngineState, new_g: int) -> S.EngineState:
    """Zero-pad the group axis so freshly-arrived object groups can join an
    existing state. Per-field group axes: lt/curr/embs/shortcuts/obj_nums/
    lt_count -> 0; st -> 1."""
    old_g = state.batch

    def pad(x, axis):
        if x is None:
            return None
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, new_g - old_g)
        return jnp.pad(x, widths)

    return state.replace(
        lt=tuple({k: pad(v, 0) for k, v in l.items()} for l in state.lt),
        lt_count=pad(state.lt_count, 0),
        st=tuple({k: pad(v, 1) for k, v in l.items()} for l in state.st),
        curr=tuple({k: pad(v, 0) for k, v in l.items()} for l in state.curr),
        embs=tuple(pad(e, 0) for e in state.embs),
        shortcuts=tuple(pad(s, 0) for s in state.shortcuts),
        obj_nums=pad(state.obj_nums, 0),
    )


def build_infer_engine(model, cfg, aggregation: str = "soft") -> "VOSInferEngine":
    """Build the eval engine from a Config (reference:
    networks/engines/__init__.py:5-21 name x phase dispatch — here the AOT /
    DeAOT split is carried by the model's memory structure)."""
    from aot_tpu.ops.attention import set_attn_impl, set_attn_thresholds

    set_attn_impl(cfg.get("ATTN_IMPL", "auto"))
    set_attn_thresholds(
        flash_min_keys_bf16=cfg.get("ATTN_FLASH_MIN_KEYS_BF16"),
        flash_min_keys_fp32=cfg.get("ATTN_FLASH_MIN_KEYS_FP32"),
        dense_local_max_tokens=cfg.get("ATTN_DENSE_LOCAL_MAX_TOKENS"))
    eng = VOSEngine(
        model,
        max_obj_num=cfg.MODEL_MAX_OBJ_NUM,
        lt_gap=cfg.TEST_LONG_TERM_MEM_GAP,
        st_skip=cfg.TEST_SHORT_TERM_MEM_SKIP,
        lt_cap=cfg.TEST_LONG_TERM_MEM_CAP,
        lt_policy=cfg.TEST_LONG_TERM_MEM_POLICY,
        top_k=cfg.get("TEST_TOP_K", -1),
        max_mem_len_ratio=cfg.get("TEST_MAX_MEM_LEN_RATIO", -1.0),
        align_corners=cfg.MODEL_ALIGN_CORNERS,
    )
    return VOSInferEngine(eng, aggregation=aggregation)


class LTShadow:
    """Host-side mirror of the long-term-memory write schedule.

    Every LT write is decided by host-visible control flow (frame index,
    add_reference events, the gap test — aot_engine.py:334-338), so the
    evaluator can know the post-write LT frame count WITHOUT a device sync
    and grow the ring buffer just in time ('grow' policy)."""

    def __init__(self, lt_gap: int):
        self.gap = lt_gap
        self.count = 0
        self.last = -(1 << 30)

    def add_ref(self, frame_step: int) -> int:
        self.count += 1
        self.last = frame_step
        return self.count

    def will_write(self, frame_step: int) -> bool:
        return frame_step - self.last >= self.gap

    def update(self, frame_step: int, skip_long_term: bool = False) -> int:
        """Mirror of VOSEngine.update_memory's gap clock. Returns the LT
        count after the call."""
        if self.will_write(frame_step):
            if not skip_long_term:
                self.count += 1
            self.last = frame_step
        return self.count


class VOSInferEngine:
    """Online inference engine for one video (any number of objects)."""

    def __init__(self, engine: VOSEngine, aggregation: str = "soft"):
        self.engine = engine
        self.max_obj_num = engine.max_obj_num
        self.aggregation = aggregation
        self._grow_fn = jax.jit(engine.grow_lt,
                                static_argnames=("hw", "new_cap"))

    def make_shadow(self) -> LTShadow:
        return LTShadow(self.engine.lt_gap)

    def lt_cap(self, state: S.EngineState) -> int:
        hw = state.embs[0].shape[1]
        return self.engine.lt_cap_of(state, hw)

    def ensure_lt_capacity(self, state: S.EngineState,
                           needed: int) -> S.EngineState:
        """Grow the LT ring (next power-of-two bucket) so `needed` frames
        fit. No-op unless the engine runs the 'grow' policy. Retraces
        downstream jits once per bucket — O(log T) compiles per video
        shape, amortised by the persistent compile cache."""
        if self.engine.lt_policy != "grow":
            return state
        cap = self.lt_cap(state)
        if needed <= cap:
            return state
        new_cap = max(cap * 2, 1 << (needed - 1).bit_length())
        hw = state.embs[0].shape[1]
        return self._grow_fn(state, hw=hw, new_cap=new_cap)

    # group bookkeeping is host-side (python ints)
    def num_groups(self, obj_num: int) -> int:
        return groups_for(obj_num, self.max_obj_num)

    def _broadcast_embs(self, xs: Sequence[jax.Array], g: int):
        return [jnp.broadcast_to(x, (g,) + x.shape[1:]) for x in xs]

    def add_reference_frame(
        self,
        params,
        img: jax.Array,
        mask: jax.Array,
        obj_num: int,
        state: Optional[S.EngineState] = None,
        frame_step: int = 0,
    ) -> S.EngineState:
        """img: (1, H, W, 3); mask: (1, H, W) with ids 1..obj_num."""
        g = self.num_groups(obj_num)
        sep = separate_mask(mask, g, self.max_obj_num)
        obj_nums = jnp.asarray(
            separated_obj_nums(obj_num, g, self.max_obj_num), jnp.int32)
        xs = self.engine.encode_image(params, img)
        xs = self._broadcast_embs(xs, g)
        if state is not None and state.batch < g:
            state = _expand_groups(state, g)
        return self.engine.add_reference_frame(
            params, None, sep, obj_nums, state=state, img_embs=xs,
            frame_step=frame_step)

    def propagate(self, params, state: S.EngineState, img: jax.Array):
        g = state.batch
        xs = self.engine.encode_image(params, img)
        xs = self._broadcast_embs(xs, g)
        return self.engine.propagate(params, state, None, img_embs=xs)

    def decode_logits(
        self, params, state: S.EngineState,
        output_size: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        """Aggregated (1, h, w, 1 + G*M) logits
        (reference: aot_engine.py:618-623)."""
        logits = self.engine.decode_logits(params, state, output_size=None)
        agg = (soft_aggregate_logits if self.aggregation == "soft"
               else min_aggregate_logits)(logits, self.max_obj_num)
        if output_size is not None:
            agg = interpolate_bilinear(
                agg, output_size, align_corners=self.engine.align_corners)
        return agg

    def update_memory(self, params, state: S.EngineState, mask: jax.Array):
        """mask: (1, H16*16-ish, W) predicted full-id label map
        (reference: aot_engine.py:625-630)."""
        g = state.batch
        sep = separate_mask(mask, g, self.max_obj_num)
        return self.engine.update_memory(params, state, mask=sep)

    def step(
        self,
        params,
        state: S.EngineState,
        img: jax.Array,
        output_size: Tuple[int, int],
    ):
        """Fused per-frame inference: propagate -> decode -> argmax ->
        update_memory, one jit dispatch, mask feedback stays on-device.
        Returns (state, pred_label (1, H, W) int32, grid-resolution
        aggregated logits). The full-resolution argmax rides the
        channel-first matmul upsample (ops/image.upsample_argmax) — the
        NHWC gather form padded C=11 to 128 lanes; full-res logits are
        no longer returned (no caller consumed them; prob/TTA consumers
        use decode_logits directly)."""
        state = self.propagate(params, state, img)
        logits = self.decode_logits(params, state, output_size=None)
        pred = upsample_argmax(logits, output_size,
                               align_corners=self.engine.align_corners)
        # memory update uses the decoder-resolution mask downscaled back to
        # the engine grid via one-hot conv (get_id_emb strides at 16)
        state = self.update_memory(params, state, pred)
        return state, pred, logits

    # --- batched multi-video serving ------------------------------------
    # N independent videos stepped in ONE dispatch: the engine's batch axis
    # carries videos instead of object groups (each video <= max_obj_num
    # objects, i.e. exactly one group). decode_logits already masks unused
    # ids per batch row via state.obj_nums, and every memory/attention op
    # treats rows independently, so no aggregation is involved. This is the
    # TPU-native answer to the reference's multi-GPU eval queue
    # (evaluator.py:216-235): instead of one video per device process, N
    # videos share one chip's idle MXU.

    def add_reference_frames_videos(
        self,
        params,
        imgs: jax.Array,       # (N, H, W, 3)
        masks: jax.Array,      # (N, H, W) int, ids 1..obj_num per video
        obj_nums,              # (N,) ints, each <= max_obj_num
    ) -> S.EngineState:
        obj_nums = jnp.asarray(obj_nums, jnp.int32)
        xs = self.engine.encode_image(params, imgs)
        return self.engine.add_reference_frame(
            params, None, masks, obj_nums, img_embs=xs)

    def step_videos(
        self,
        params,
        state: S.EngineState,
        imgs: jax.Array,       # (N, h, w, 3) at input (snapped) size
        orig_size: Tuple[int, int],
        input_size: Optional[Tuple[int, int]] = None,
    ):
        """Fused per-frame step over N videos: propagate -> decode at the
        ORIGINAL resolution -> argmax -> (nearest-down to input size) ->
        update_memory, all rows in one dispatch — per row exactly the
        Evaluator's scalar cadence. Ragged lengths batch by replaying a
        finished video's last frame and discarding its outputs — rows never
        interact, so dead rows cannot corrupt live ones.
        Returns (state, preds (N, H, W) int32 at orig_size)."""
        xs = self.engine.encode_image(params, imgs)
        state = self.engine.propagate(params, state, None, img_embs=xs)
        logits = self.engine.decode_logits(params, state, output_size=None)
        pred = upsample_argmax(
            logits, orig_size,
            align_corners=self.engine.align_corners)  # (N, H, W)
        lab = pred
        if input_size is not None and tuple(input_size) != tuple(orig_size):
            lab = interpolate_nearest(
                pred[..., None].astype(jnp.float32), input_size)
            lab = lab[..., 0].astype(jnp.int32)
        state = self.engine.update_memory(params, state, mask=lab)
        return state, pred

    def step_chunk(
        self,
        params,
        state: S.EngineState,
        imgs: jax.Array,
        orig_size: Tuple[int, int],
        input_size: Tuple[int, int],
    ):
        """K frames in ONE dispatch: `lax.scan` over the fused per-frame
        step with on-device mask feedback — upload K frames, read back K
        masks, instead of K host round-trips. The reference evaluates
        strictly frame-by-frame with a device sync per frame
        (evaluator.py:408 region); chunking is the TPU-idiomatic
        equivalent for the label-free stretches between annotated frames
        (which for DAVIS/YTB is every frame after the first).

        Per frame this runs the EXACT ops of the Evaluator's scalar path
        (propagate -> aggregated logits -> bilinear to orig_size -> argmax
        -> nearest-down to input_size -> update_memory), so the masks are
        bit-identical to per-frame stepping; `tests/test_eval_chunked.py`
        pins that. (Bit-equality holds per backend: the scan body and the
        unrolled per-frame graph can fuse differently on TPU, and the
        resulting ~1e-6 logit reorderings flip argmax only on boundary
        near-ties — the same drift class as cross-framework parity.) The LT-gap clock lives in device state, so conditional
        long-term writes happen inside the scan; with the 'grow' policy the
        caller must pre-grow capacity for the whole chunk
        (`ensure_lt_capacity`, schedule known host-side via `LTShadow`).

        imgs: (K, 1, h, w, 3). Returns (state, preds (K, 1, H, W) uint8).
        """

        def body(st, img):
            st = self.propagate(params, st, img)
            logits = self.decode_logits(params, st, output_size=None)
            pred = upsample_argmax(logits, orig_size,
                                   align_corners=self.engine.align_corners)
            lab = interpolate_nearest(
                pred[..., None].astype(jnp.float32), input_size)
            lab = lab[..., 0].astype(jnp.int32)
            st = self.update_memory(params, st, lab)
            return st, pred.astype(jnp.uint8)

        return jax.lax.scan(body, state, imgs)
