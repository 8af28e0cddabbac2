"""VOSEngine: pure-functional temporal state machine
(reference: networks/engines/aot_engine.py AOTEngine / deaot_engine.py).

Every method is a pure function (params, state, inputs) -> outputs suitable
for jax.jit; the caller owns compilation. One engine instance serves both AOT
(memory dicts {k, v}) and DeAOT ({k, v, id_v}) — the dict structure is
determined by the model's returned memories.

Differences from the reference, by design (see ARCHITECTURE.md):
  - memory writes go into pre-allocated ring buffers (no concat growth);
  - the per-frame inference path is `propagate -> decode_logits ->
    update_memory`, all jittable, with a fused `step` that keeps the
    mask feedback loop on-device.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aot_tpu.engine import state as S
from aot_tpu.ops.image import interpolate_bilinear
from aot_tpu.ops.position import sine_position_embedding_seq

NEG_LOGIT = -1e10


class VOSEngine:
    """Binds a model + static hyperparameters; stateless otherwise."""

    def __init__(
        self,
        model,
        max_obj_num: int,
        lt_gap: int = 9999,
        st_skip: int = 1,
        lt_cap: int = 8,
        lt_policy: str = "fifo",
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        align_corners: bool = True,
    ):
        self.model = model
        self.max_obj_num = max_obj_num
        self.lt_gap = lt_gap
        self.st_skip = max(1, st_skip)
        self.lt_cap = max(1, lt_cap)
        self.lt_policy = lt_policy
        self.top_k = top_k
        self.max_mem_len_ratio = max_mem_len_ratio
        self.align_corners = align_corners

    # --- model plumbing -----------------------------------------------------
    def _apply(self, params, method, *args, rngs=None, **kw):
        return self.model.apply({"params": params}, *args,
                                method=method, rngs=rngs, **kw)

    def encode_image(self, params, img):
        if img.dtype == jnp.uint8:
            # device-side normalisation: callers may feed raw uint8 frames
            # (4x less host->device traffic on the per-frame hot path)
            from aot_tpu.data import IMAGENET_MEAN, IMAGENET_STD

            img = img.astype(jnp.float32) / 255.0
            img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return self._apply(params, type(self.model).encode_image, img)

    def get_id_emb(self, params, one_hot, *, deterministic=True, rngs=None):
        return self._apply(params, type(self.model).get_id_emb, one_hot,
                           deterministic=deterministic, rngs=rngs)

    def get_id_emb_label(self, params, label, *, deterministic=True,
                         rngs=None):
        """Id embedding from an int label map — the id bank's blocked
        matmul path (skips the lane-padded NHWC one-hot)."""
        return self._apply(params, type(self.model).get_id_emb_label, label,
                           deterministic=deterministic, rngs=rngs)

    # --- state construction ---------------------------------------------
    def _seed_state(self, mems, embs, shortcuts, obj_nums, frame_step):
        """Build a fresh EngineState from reference-frame memories."""
        hw = embs[0].shape[1]
        cap, skip = self.lt_cap, self.st_skip

        lt, st, curr = [], [], []
        for m in mems:
            g = m["global"]
            layer_lt, layer_st = {}, {}
            for key, val in g.items():
                if val is None:
                    continue
                b, _, c = val.shape
                buf = jnp.zeros((b, cap * hw, c), val.dtype)
                layer_lt[key] = jax.lax.dynamic_update_slice(
                    buf, val, (0, 0, 0))
                sbuf = jnp.zeros((skip, b, hw, c), val.dtype)
                layer_st[key] = sbuf.at[0].set(val)
            lt.append(layer_lt)
            st.append(layer_st)
            curr.append(dict(m["curr"]))

        batch = embs[0].shape[0]
        return S.EngineState(
            lt=tuple(lt),
            lt_count=jnp.ones((batch,), jnp.int32),
            st=tuple(st),
            st_ptr=jnp.zeros((), jnp.int32),
            st_count=jnp.ones((), jnp.int32),
            curr=tuple(curr),
            embs=tuple(embs),
            shortcuts=tuple(shortcuts),
            frame_step=jnp.asarray(frame_step, jnp.int32),
            last_mem_step=jnp.asarray(frame_step, jnp.int32),
            obj_nums=jnp.asarray(obj_nums, jnp.int32).reshape(-1),
        )

    @staticmethod
    def lt_cap_of(state: S.EngineState, hw: int) -> int:
        """Current LT capacity in frames, derived from buffer shape (static
        under jit). Under the 'grow' policy this changes per bucket."""
        first = next(iter(state.lt[0].values()))
        return first.shape[1] // hw

    def grow_lt(self, state: S.EngineState, hw: int,
                new_cap: int) -> S.EngineState:
        """Re-bucket the LT ring to `new_cap` frames (zero-pad the token
        axis). Valid because slots are written sequentially until full, so
        no wrap has occurred when the caller grows. Gives the reference's
        unbounded memory (aot_engine.py:291-305) with O(log T) retraces."""
        old_cap = self.lt_cap_of(state, hw)
        if new_cap <= old_cap:
            return state
        pad = (new_cap - old_cap) * hw

        def grow(buf):
            widths = [(0, 0)] * buf.ndim
            widths[1] = (0, pad)
            return jnp.pad(buf, widths)

        return state.replace(
            lt=tuple({k: grow(v) for k, v in layer.items()}
                     for layer in state.lt))

    def _lt_views(self, state: S.EngineState, hw: int):
        valid = S.lt_valid_len(state, self.lt_cap_of(state, hw), hw)
        return list(state.lt), valid

    def _st_views(self, state: S.EngineState):
        slot = S.st_oldest_slot(state.st_ptr, state.st_count, self.st_skip)
        views = []
        for layer in state.st:
            views.append({k: jax.lax.dynamic_index_in_dim(
                v, slot, axis=0, keepdims=False) for k, v in layer.items()})
        return views

    # --- reference frame --------------------------------------------------
    def add_reference_frame(
        self,
        params,
        img: Optional[jax.Array],
        mask: jax.Array,
        obj_nums,
        state: Optional[S.EngineState] = None,
        img_embs: Optional[Sequence[jax.Array]] = None,
        frame_step: int = 0,
        *,
        id_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
        rngs=None,
    ) -> S.EngineState:
        """Seed (or extend, for mid-video new objects — reference:
        evaluator.py:363-399) the memory from a ground-truth mask.
        mask: (B, H, W) int labels. (reference: aot_engine.py:188-251)"""
        xs = img_embs if img_embs is not None else self.encode_image(params, img)
        size_2d = xs[-1].shape[1:3]
        hw = size_2d[0] * size_2d[1]

        if id_emb is None:
            id_emb = self.get_id_emb_label(
                params, mask, deterministic=deterministic, rngs=rngs)
        pos = sine_position_embedding_seq(*size_2d, self.model.emb_dim)

        embs, mems = self._apply(
            params, type(self.model).lstt_forward,
            xs[-1], None, None, id_emb, pos, size_2d,
            deterministic=deterministic, rngs=rngs)

        if state is None:
            return self._seed_state(mems, embs, xs, obj_nums, frame_step)

        # existing state: append LT, reset the ST ring to this frame
        new_lt = self._write_lt(state, [m["global"] for m in mems], hw)
        new_st = []
        for layer in mems:
            g = layer["global"]
            layer_st = {}
            for key, val in g.items():
                if val is None:
                    continue
                sbuf = jnp.zeros((self.st_skip,) + val.shape, val.dtype)
                layer_st[key] = sbuf.at[0].set(val)
            new_st.append(layer_st)
        return state.replace(
            lt=new_lt,
            lt_count=state.lt_count + 1,
            st=tuple(new_st),
            st_ptr=jnp.zeros((), jnp.int32),
            st_count=jnp.ones((), jnp.int32),
            curr=tuple(dict(m["curr"]) for m in mems),
            embs=tuple(embs),
            shortcuts=tuple(xs),
            frame_step=jnp.asarray(frame_step, jnp.int32),
            last_mem_step=jnp.asarray(frame_step, jnp.int32),
            obj_nums=jnp.asarray(obj_nums, jnp.int32).reshape(-1),
        )

    # --- per-frame propagation ---------------------------------------------
    def propagate(
        self,
        params,
        state: S.EngineState,
        img: Optional[jax.Array],
        img_embs: Optional[Sequence[jax.Array]] = None,
        *,
        deterministic: bool = True,
        rngs=None,
    ) -> S.EngineState:
        """Attend the new frame against memory
        (reference: aot_engine.py:340-354)."""
        xs = img_embs if img_embs is not None else self.encode_image(params, img)
        size_2d = xs[-1].shape[1:3]
        hw = size_2d[0] * size_2d[1]
        pos = sine_position_embedding_seq(*size_2d, self.model.emb_dim)

        lt_mems, lt_valid = self._lt_views(state, hw)
        st_mems = self._st_views(state)

        embs, mems = self._apply(
            params, type(self.model).lstt_forward,
            xs[-1], lt_mems, st_mems, None, pos, size_2d,
            lt_valid_len=lt_valid, top_k=self.top_k,
            max_mem_len_ratio=self.max_mem_len_ratio,
            deterministic=deterministic, rngs=rngs)

        return state.replace(
            curr=tuple(dict(m["curr"]) for m in mems),
            embs=tuple(embs),
            shortcuts=tuple(xs),
            frame_step=state.frame_step + 1,
        )

    # --- decoding -----------------------------------------------------------
    def decode_logits(
        self,
        params,
        state: S.EngineState,
        output_size: Optional[Tuple[int, int]] = None,
        *,
        rngs=None,
        deterministic: bool = True,
    ) -> jax.Array:
        """(B, h4, w4 or output, M+1) fp32 logits with unused ids masked
        (reference: aot_engine.py:356-380)."""
        logits = self._apply(
            params, type(self.model).decode_id_logits,
            state.embs, state.shortcuts, rngs=rngs)
        ids = jnp.arange(self.max_obj_num + 1)[None, None, None, :]
        keep = ids <= state.obj_nums[:, None, None, None]
        logits = jnp.where(keep, logits, NEG_LOGIT)
        if output_size is not None:
            logits = interpolate_bilinear(
                logits, output_size, align_corners=self.align_corners)
        return logits

    # --- memory update -------------------------------------------------------
    def _fuse_curr(self, params, state: S.EngineState, id_emb):
        """Fuse the predicted mask's identity into the current frame's
        memory entries (reference: aot_engine.py:307-327 /
        deaot_engine.py:20-45)."""
        fused_layers = []
        for idx, curr in enumerate(state.curr):
            if "id_v" in curr:  # DeAOT: fuse only the id branch
                f = self._apply(
                    params, type(self.model).fuse_memory,
                    idx, None, curr["id_v"], id_emb)
                fused_layers.append(
                    {"k": curr["k"], "v": curr["v"], "id_v": f["id_v"]})
            else:  # AOT: K kept / modulated, V fused
                f = self._apply(
                    params, type(self.model).fuse_memory,
                    idx, curr["k"], curr["v"], id_emb)
                fused_layers.append({"k": f["k"], "v": f["v"]})
        return fused_layers

    def _write_lt(self, state: S.EngineState, fused, hw: int):
        cap = self.lt_cap_of(state, hw)
        slots = S.lt_write_slot(state.lt_count, cap, self.lt_policy)  # (B,)

        # NOTE: no vmap(dynamic_update_slice) here — per-batch dynamic
        # offsets lower to an XLA scatter, which TPU serializes (~2.7 ms
        # per step at 465², the single largest cost of the fused eval
        # step before this form). B==1 writes one contiguous DMA slice;
        # B>1 does a masked rewrite of the (B, cap, hw, c) view — full
        # buffer traffic, but vectorized (µs, not ms).
        def write(buf, val):
            if buf.shape[0] == 1:
                return jax.lax.dynamic_update_slice(
                    buf, val, (0, slots[0] * hw, 0))
            b, _, c = buf.shape
            buf4 = buf.reshape(b, cap, hw, c)
            hit = (jnp.arange(cap) == slots[:, None])[..., None, None]
            return jnp.where(hit, val[:, None], buf4).reshape(b, cap * hw, c)

        new_lt = []
        for layer_lt, layer_f in zip(state.lt, fused):
            out = {}
            for key, buf in layer_lt.items():
                out[key] = write(buf, layer_f[key].astype(buf.dtype))
            new_lt.append(out)
        return tuple(new_lt)

    def update_memory(
        self,
        params,
        state: S.EngineState,
        mask: Optional[jax.Array] = None,
        prob: Optional[jax.Array] = None,
        *,
        id_emb: Optional[jax.Array] = None,
        skip_long_term_update: bool = False,
        deterministic: bool = True,
        rngs=None,
    ) -> S.EngineState:
        """Write the current frame (with predicted/GT mask identity) into the
        short-term ring and, every lt_gap frames, the long-term buffer
        (reference: aot_engine.py:307-338)."""
        if id_emb is None:
            if prob is not None:
                id_emb = self.get_id_emb(params, prob,
                                         deterministic=deterministic,
                                         rngs=rngs)
            else:
                id_emb = self.get_id_emb_label(
                    params, mask, deterministic=deterministic, rngs=rngs)
        hw = state.embs[0].shape[1]
        fused = self._fuse_curr(params, state, id_emb)

        # short-term ring append
        ptr = jnp.mod(state.st_ptr + 1, self.st_skip)
        new_st = []
        for layer_st, layer_f in zip(state.st, fused):
            out = {}
            for key, buf in layer_st.items():
                out[key] = jax.lax.dynamic_update_index_in_dim(
                    buf, layer_f[key].astype(buf.dtype), ptr, axis=0)
            new_st.append(out)

        # long-term conditional append. The gap clock (last_mem_step)
        # advances whenever the gap is reached, even when the write itself
        # is skipped — matching the reference (aot_engine.py:334-338).
        gap_hit = (state.frame_step - state.last_mem_step) >= self.lt_gap
        do_lt = gap_hit
        if skip_long_term_update:
            do_lt = jnp.zeros((), bool)
        if self.lt_policy == "stop":
            do_lt = jnp.logical_and(
                do_lt,
                jnp.min(state.lt_count) < self.lt_cap_of(state, hw))

        state = state.replace(
            st=tuple(new_st),
            st_ptr=ptr,
            st_count=jnp.minimum(state.st_count + 1, self.st_skip),
        )
        # per-buffer select instead of lax.cond: an HLO conditional carries
        # the whole EngineState through its interface every step (copies +
        # a device sync point) even though high-FPS configs (gap 9999)
        # never take the branch; computing the write and selecting is pure
        # elementwise traffic over the lt ring and fuses into the step.
        written = self._write_lt(state, fused, hw)
        new_lt = tuple(
            {k: jnp.where(do_lt, w[k], old[k]) for k in old}
            for w, old in zip(written, state.lt))
        state = state.replace(
            lt=new_lt,
            lt_count=jnp.where(do_lt, state.lt_count + 1, state.lt_count))
        return state.replace(last_mem_step=jnp.where(
            gap_hit, state.frame_step, state.last_mem_step))
