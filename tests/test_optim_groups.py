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


def test_trainable_encoder_set_matches_reference():
    """freeze_at=2 on MobileNetV2 must train features 4..18 (45 conv
    kernels in the reference, networks/encoders/mobilenetv2.py:240-247).
    Guards the prefix-collision bug where 'encoder/features_1' silently
    froze features_10..18."""
    cfg = build_config(stage="pre", model="aott")
    params = _params(cfg)
    groups = build_param_groups(cfg, params)

    trainable = sorted(
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, frozen in jax.tree_util.tree_flatten_with_path(
            groups["frozen"])[0]
        if not frozen and "/".join(
            str(getattr(k, "key", k)) for k in path).startswith("encoder/"))
    # features 4..17 = 14 inverted-residual blocks x 3 convs
    # (expand/depthwise/project) + features_18's final 1x1 conv kernel
    # = 43, matching the reference's requires_grad set exactly
    assert len(trainable) == 43, trainable
    stages = {p.split("/")[1] for p in trainable}
    assert stages == {f"features_{i}" for i in range(4, 19)}, stages


def test_weight_decay_one_dim_rule():
    """Reference learning.py:69-80: biases never decay; other 1-dim params
    decay ONLY inside the encoder when BN is frozen (Swin LN scales)."""
    cfg = build_config(stage="pre", model="aott")
    fake = {
        "encoder": {
            "layers_0": {"norm": {"scale": jnp.ones((96,)),
                                  "bias": jnp.ones((96,))},
                         "proj": {"kernel": jnp.ones((3, 3, 8, 8))}},
        },
        "lstt": {"norm1": {"scale": jnp.ones((256,)),
                           "bias": jnp.ones((256,))}},
    }
    wd = build_param_groups(cfg, fake)["wd"]
    assert wd["encoder"]["layers_0"]["norm"]["scale"] > 0  # LN scale decays
    assert wd["encoder"]["layers_0"]["norm"]["bias"] == 0.0
    assert wd["encoder"]["layers_0"]["proj"]["kernel"] > 0
    assert wd["lstt"]["norm1"]["scale"] == 0.0  # outside encoder: no decay
    assert wd["lstt"]["norm1"]["bias"] == 0.0
