"""The jitted training step: loss -> grads -> clipped AdamW -> EMA, sharded
over the data axis of a device mesh.

With params replicated and the batch sharded, XLA inserts the gradient
all-reduce over ICI automatically (the reference relies on DDP's implicit
allreduce, trainer.py:69-74).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from aot_tpu.engine.train import TrainEngine
from aot_tpu.ops.image import generate_permute_matrix
from aot_tpu.train import ema as ema_lib
from aot_tpu.train.optim import build_optimizer


@struct.dataclass
class TrainState:
    step: jax.Array
    params: dict
    opt_state: object
    ema: Optional[ema_lib.EMAState]
    # BN running stats — only populated when MODEL_FREEZE_BN=False
    # (trainable/Sync BN, reference: trainer.py:66-67); None otherwise
    batch_stats: Optional[dict] = None


def create_train_state(cfg, params, with_ema: bool = True,
                       batch_stats: Optional[dict] = None) -> TrainState:
    tx = build_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_lib.ema_init(params) if with_ema else None,
        batch_stats=batch_stats,
    )


def make_train_step(cfg, engine: TrainEngine, enable_id_shuffle: bool = True):
    """Returns train_step(state, frames, masks, obj_nums, rng) ->
    (state, stats). Close over a fresh optimizer (same hyperparams as the
    state's)."""
    tx = build_optimizer_cached(cfg)
    ema_decay = ema_lib.ema_decay_for(cfg)
    max_obj = cfg.MODEL_MAX_OBJ_NUM

    enable_prev_frame = cfg.TRAIN_ENABLE_PREV_FRAME and \
        "static" not in cfg.DATASETS  # (reference: trainer.py:296-298)

    def loss_fn(params, batch_stats, frames, masks, obj_nums, step, shuffle,
                rngs, use_prev_pred):
        # trace-time flag: route every global attention in the TRAINING
        # program through the differentiable flash kernel (ops.attention)
        from aot_tpu.ops.attention import attn_training_context

        with attn_training_context():
            return engine.forward(
                params, frames, masks, obj_nums, step,
                shuffle_matrix=shuffle, use_prev_pred=use_prev_pred,
                enable_prev_frame=enable_prev_frame, rngs=rngs,
                batch_stats=batch_stats)

    def train_step(state: TrainState, frames, masks, obj_nums, rng,
                   use_prev_pred: bool):
        """frames: (T, B, H, W, 3); masks: (T, B, H, W); obj_nums: (B,)."""
        b = frames.shape[1]
        r_shuffle, r_drop, r_path = jax.random.split(rng, 3)
        shuffle = (generate_permute_matrix(r_shuffle, max_obj + 1, b)
                   if enable_id_shuffle else None)
        rngs = {"dropout": r_drop, "droppath": r_path}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, stats), grads = grad_fn(
            state.params, state.batch_stats, frames, masks, obj_nums,
            state.step.astype(jnp.float32), shuffle, rngs, use_prev_pred)
        stats = dict(stats)
        new_bs = stats.pop("batch_stats", state.batch_stats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        ema = (ema_lib.ema_update(state.ema, params, ema_decay)
               if state.ema is not None else None)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema,
            batch_stats=new_bs)
        stats["grad_norm"] = optax_global_norm(grads)
        return new_state, stats

    return train_step


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def build_optimizer_cached(cfg):
    return _OptimizerLazy(cfg)


class _OptimizerLazy:
    """Optimizer whose param-group metadata is derived lazily from the first
    update's params tree (build_optimizer needs params for path grouping)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._tx = None

    def _get(self, params):
        if self._tx is None:
            self._tx = build_optimizer(self.cfg, params)
        return self._tx

    def init(self, params):
        return self._get(params).init(params)

    def update(self, grads, state, params):
        return self._get(params).update(grads, state, params)


def shard_train_step(train_step, mesh, axis: str = "data"):
    """jit the step with params/opt replicated and batch sharded on `axis`.

    frames/masks shard on their batch axis (axis 1: (T, B, ...)); obj_nums on
    axis 0. use_prev_pred is static.
    """
    repl = NamedSharding(mesh, P())
    frames_s = NamedSharding(mesh, P(None, axis))
    masks_s = NamedSharding(mesh, P(None, axis))
    obj_s = NamedSharding(mesh, P(axis))

    return jax.jit(
        train_step,
        in_shardings=(repl, frames_s, masks_s, obj_s, repl),
        static_argnums=(5,),
        donate_argnums=(0,),
    )
