"""Optimizer param-group metadata: structural FrozenBN detection (a module
is BN iff it carries running statistics — no name heuristics), encoder
freeze_at prefixes, and weight-decay exemptions."""

from functools import partial

import jax
import jax.numpy as jnp

from aot_tpu.configs import build_config
from aot_tpu.models import build_vos_model
from aot_tpu.train.optim import build_param_groups


def _params(cfg):
    model = build_vos_model(cfg)
    h = w = 65
    return jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 11)))["params"]


def test_frozen_bn_is_structural():
    cfg = build_config(stage="pre", model="aott")  # mobilenetv2, FREEZE_BN
    params = _params(cfg)
    groups = build_param_groups(cfg, params)

    flat_frozen = {
        "/".join(str(getattr(k, "key", k)) for k in path): bool(v)
        for path, v in jax.tree_util.tree_flatten_with_path(
            groups["frozen"])[0]
    }
    flat_params = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }

    # every param that shares a module with running stats must be frozen
    bn_modules = {p.rsplit("/", 1)[0] for p in flat_params
                  if p.endswith("/running_mean")}
    assert bn_modules, "encoder should contain FrozenBN modules"
    n_bn_leaves = 0
    for p, frozen in flat_frozen.items():
        if p.rsplit("/", 1)[0] in bn_modules:
            assert frozen, f"BN param {p} not frozen"
            n_bn_leaves += 1
    # scale/bias/mean/var per BN module
    assert n_bn_leaves == 4 * len(bn_modules)

    # LSTT / decoder params are never frozen by the BN rule
    assert not any(frozen for p, frozen in flat_frozen.items()
                   if not p.startswith("encoder"))
