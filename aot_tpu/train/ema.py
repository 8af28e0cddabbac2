"""Exponential moving average over parameter pytrees
(reference: utils/ema.py — warmup-aware decay min(decay, (1+n)/(10+n))).

decay defaults to 1 - 1/(total_steps * TRAIN_EMA_RATIO)
(reference: trainer.py:92-97).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    shadow: dict
    num_updates: jax.Array  # () int32


def ema_init(params) -> EMAState:
    # real copies, not aliases: the train step donates the whole TrainState,
    # and XLA refuses to donate the same buffer twice
    return EMAState(shadow=jax.tree.map(jnp.copy, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - d
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p), state.shadow, params)
    return EMAState(shadow=shadow, num_updates=n)


def ema_decay_for(cfg) -> float:
    return 1.0 - 1.0 / (cfg.TRAIN_TOTAL_STEPS * cfg.TRAIN_EMA_RATIO)
