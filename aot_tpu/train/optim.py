"""Optimizer with the reference's per-parameter-group semantics
(reference: utils/learning.py).

Groups are derived from parameter paths:
  - frozen: FrozenBN statistics/affine, frozen encoder stages (freeze_at),
    -> zero update (the reference excludes them via requires_grad).
  - encoder: lr = (now_lr - min_lr) * encoder_ratio + min_lr
    (learning.py:40-42).
  - patch_wise_id_bank: lr = 0 once sequential training starts
    (trainer freeze list, configs/default.py:66; learning.py:43-46).
  - weight decay: 0 for 1-dim params and for name-matched exemptions
    (learning.py:69-80); optional per-name overrides.

Implemented as one custom optax transformation so per-leaf lr/wd stay
data-parallel-friendly scalars computed from the step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from aot_tpu.models.encoders import frozen_param_patterns


def poly_warmup_lr(cfg):
    """now_lr(step) (reference: utils/learning.py:4-38)."""
    base = cfg.TRAIN_LR
    min_lr = cfg.TRAIN_LR_MIN
    power = cfg.TRAIN_LR_POWER
    total = cfg.TRAIN_TOTAL_STEPS
    restart = max(1, cfg.TRAIN_LR_RESTART)
    warm = cfg.TRAIN_LR_WARM_UP_RATIO * total
    cosine = cfg.TRAIN_LR_COSINE_DECAY

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if restart > 1:
            each = math.ceil(total / restart)
            step = jnp.mod(step, each)
            w, m = warm / restart, each
        else:
            w, m = warm, total
        warm_lr = min_lr + (base - min_lr) * step / w
        s2 = step - w
        m2 = m - w
        if cosine:
            decay_lr = min_lr + (base - min_lr) * (
                jnp.cos(math.pi * s2 / (m2 + 1)) + 1.0) * 0.5
        else:
            decay_lr = min_lr + (base - min_lr) * (1.0 - s2 / (m2 + 1)) ** power
        return jnp.where(step < w, warm_lr, decay_lr)

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def build_param_groups(cfg, params) -> Dict[str, Any]:
    """Per-leaf group metadata trees: wd (float), is_encoder, frozen,
    seq_freeze (id bank)."""
    frozen_prefixes = frozen_param_patterns(
        cfg.MODEL_ENCODER, cfg.TRAIN_ENCODER_FREEZE_AT)
    if cfg.MODEL_FREEZE_BACKBONE:
        # trailing '/' so encoder_projector/* is NOT caught (the reference
        # freezes only the encoder module, trainer.py:84-88)
        frozen_prefixes = ["encoder/"]
    no_wd_keys = list(cfg.TRAIN_WEIGHT_DECAY_EXEMPTION)
    exclusive = dict(cfg.TRAIN_WEIGHT_DECAY_EXCLUSIVE)
    seq_freeze_keys = list(cfg.TRAIN_SEQ_TRAINING_FREEZE_PARAMS)

    # structural FrozenBN detection: a module IS a FrozenBatchNorm iff it
    # carries running statistics as params (encoders/common.py:33-34) — no
    # reliance on layer naming conventions
    bn_modules = set()

    def _collect_bn(path, _leaf):
        p = _path_str(path)
        if p.endswith("/running_mean"):
            bn_modules.add(p[: -len("/running_mean")])

    jax.tree_util.tree_map_with_path(_collect_bn, params)

    def leaf_meta(path, leaf):
        p = _path_str(path)
        module = p.rsplit("/", 1)[0] if "/" in p else ""
        frozen = (
            any(p.startswith(fp) for fp in frozen_prefixes)
            # FrozenBN statistics/affine are buffers in the reference —
            # never optimized (normalization.py:13-17)
            or "running_mean" in p or "running_var" in p
        )
        if cfg.MODEL_FREEZE_BN and module in bn_modules:
            frozen = True
        wd = cfg.TRAIN_WEIGHT_DECAY
        for k, v in exclusive.items():
            if k in p:
                wd = v
                break
        if leaf.ndim <= 1:
            # reference rule (learning.py:69-80): biases never decay;
            # other 1-dim params decay ONLY inside the encoder when BN is
            # frozen (e.g. Swin LayerNorm scales)
            if p.endswith("/bias") or not cfg.MODEL_FREEZE_BN \
                    or not p.startswith("encoder/"):
                wd = 0.0
        else:
            for k in no_wd_keys:
                if k in p:
                    wd = 0.0
                    break
        return {
            "wd": wd,
            # 'encoder/' (not bare 'encoder') so the 0.1x encoder LR ratio
            # never hits encoder_projector/* (reference learning.py:40-42
            # matches 'encoder.' module keys only)
            "encoder": p.startswith("encoder/"),
            "frozen": frozen,
            "seq_freeze": any(k in p for k in seq_freeze_keys),
        }

    metas = jax.tree_util.tree_map_with_path(leaf_meta, params)
    return {
        key: jax.tree.map(lambda m: m[key], metas,
                          is_leaf=lambda x: isinstance(x, dict) and "wd" in x)
        for key in ("wd", "encoder", "frozen", "seq_freeze")
    }


class VOSOptState(NamedTuple):
    count: jax.Array
    adam: optax.ScaleByAdamState


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam moments -> per-group AdamW update."""
    groups = build_param_groups(cfg, params)
    schedule = poly_warmup_lr(cfg)
    min_lr = cfg.TRAIN_LR_MIN
    enc_ratio = cfg.TRAIN_LR_ENCODER_RATIO
    seq_start = cfg.TRAIN_SEQ_TRAINING_START_RATIO * cfg.TRAIN_TOTAL_STEPS
    clip = optax.clip_by_global_norm(cfg.TRAIN_CLIP_GRAD_NORM)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    use_sgd = cfg.TRAIN_OPT != "adamw"
    momentum = cfg.TRAIN_SGD_MOMENTUM

    def init(params_):
        if use_sgd:
            adam_state = optax.trace(decay=momentum).init(params_)
        else:
            adam_state = adam.init(params_)
        return VOSOptState(count=jnp.zeros((), jnp.int32), adam=adam_state)

    def update(grads, state, params_):
        step = state.count.astype(jnp.float32)
        grads, _ = clip.update(grads, optax.EmptyState(), params_)
        if use_sgd:
            upd, adam_state = optax.trace(decay=momentum).update(
                grads, state.adam, params_)
        else:
            upd, adam_state = adam.update(grads, state.adam, params_)
        now_lr = schedule(step)
        enc_lr = (now_lr - min_lr) * enc_ratio + min_lr
        seq_on = step >= seq_start

        def leaf_update(u, p, wd, is_enc, frozen, seq_frz):
            lr = jnp.where(is_enc, enc_lr, now_lr)
            lr = jnp.where(jnp.logical_and(seq_on, seq_frz), 0.0, lr)
            wd_eff = jnp.where(jnp.logical_and(seq_on, seq_frz), 0.0, wd)
            out = -lr * (u + wd_eff * p)
            return jnp.where(frozen, 0.0, out).astype(p.dtype)

        new_upd = jax.tree.map(
            leaf_update, upd, params_,
            jax.tree.map(jnp.float32, groups["wd"]),
            groups["encoder"], groups["frozen"], groups["seq_freeze"])
        return new_upd, VOSOptState(count=state.count + 1, adam=adam_state)

    return optax.GradientTransformation(init, update)
