"""EngineState: the explicit pytree replacing the reference engine's mutable
Python attributes (reference: aot_engine.py:445-477 restart_engine zeroes
them; here a fresh pytree is built per video).

Memory model (static shapes, SURVEY §5.7 TPU-native plan):
  - long-term: per-layer flattened ring buffer (B, CAP*HW, C) + total write
    count; live tokens = min(count, CAP) * HW (the attention mask).
  - short-term: per-layer depth-SKIP ring (SKIP, B, HW, C) + pointer/count;
    reads the OLDEST live entry, matching the reference's
    `short_term_memories_list[0]` (aot_engine.py:329-332).
  - curr: the unfused per-frame projections consumed by decode/update
    (the reference's `curr_lstt_output`).

Dict values may contain an 'id_v' entry (DeAOT's dual branch); structure is
fixed per model so jit sees a stable pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

LayerMem = Dict[str, Any]


@struct.dataclass
class EngineState:
    lt: Tuple[LayerMem, ...]
    lt_count: jax.Array  # (B,) int32 — per-sample total LT writes (groups
    # appended mid-video have shorter memories — reference adds sub-engines
    # on the fly, aot_engine.py:584-609)
    st: Tuple[LayerMem, ...]
    st_ptr: jax.Array  # () int32 — most recent ST slot
    st_count: jax.Array  # () int32 — live ST entries (<= SKIP)
    curr: Tuple[LayerMem, ...]
    embs: Tuple[jax.Array, ...]
    shortcuts: Tuple[jax.Array, ...]
    frame_step: jax.Array  # () int32
    last_mem_step: jax.Array  # () int32
    obj_nums: jax.Array  # (B,) int32

    @property
    def batch(self) -> int:
        return self.lt[0]["k"].shape[0]


def lt_valid_len(state: EngineState, cap: int, hw: int) -> jax.Array:
    return jnp.minimum(state.lt_count, cap) * hw  # (B,)


def lt_write_slot(count: jax.Array, cap: int, policy: str) -> jax.Array:
    """Frame slot for the next LT write. 'grow' writes sequentially (the
    caller re-buckets capacity before it would overflow, giving the
    reference's unbounded-concat semantics, aot_engine.py:291-305); 'fifo'
    pins slot 0 (the reference frame) and cycles slots 1..CAP-1; 'stop'
    freezes when full."""
    if cap == 1:
        return jnp.zeros_like(count)
    if policy == "fifo":
        wrapped = 1 + (count - cap) % (cap - 1)
        return jnp.where(count < cap, count, wrapped).astype(jnp.int32)
    return jnp.minimum(count, cap - 1).astype(jnp.int32)


def st_oldest_slot(ptr: jax.Array, count: jax.Array, skip: int) -> jax.Array:
    return jnp.mod(ptr - (count - 1), skip).astype(jnp.int32)
