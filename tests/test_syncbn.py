"""Trainable-BN (MODEL_FREEZE_BN=False) and SyncBN semantics.

The reference converts encoder BN to SyncBatchNorm when BN is unfrozen
(networks/managers/trainer.py:66-67). Here the batch moments are computed on
the logically-global batch inside the jitted step, so a batch-sharded mesh
reduces across replicas automatically — these tests pin (a) torch BatchNorm
numerics of the trainable path and (b) that sharded == unsharded running
stats (i.e. stats are global-batch, not per-replica).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aot_tpu.models.encoders.common import FrozenBatchNorm


def test_trainable_bn_matches_torch_semantics():
    """Train-mode forward normalises by biased batch moments; running stats
    EMA with momentum 0.1 and UNBIASED variance (torch nn.BatchNorm2d)."""
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(0)
    x = rng.randn(4, 5, 6, 3).astype(np.float32)  # NHWC

    bn = FrozenBatchNorm(3, frozen=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "batch_stats" in variables
    # give affine + running stats nontrivial values
    params = {"weight": jnp.asarray([1.5, 0.5, 2.0]),
              "bias": jnp.asarray([0.1, -0.2, 0.3])}
    stats = {"running_mean": jnp.asarray([0.5, -0.5, 0.0]),
             "running_var": jnp.asarray([2.0, 1.0, 0.5])}

    y, mutated = bn.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(np.asarray(params["weight"])))
        tbn.bias.copy_(torch.tensor(np.asarray(params["bias"])))
        tbn.running_mean.copy_(torch.tensor(np.asarray(stats["running_mean"])))
        tbn.running_var.copy_(torch.tensor(np.asarray(stats["running_var"])))
    tbn.train()
    ty = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_var"]),
        tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_trainable_bn_eval_uses_running_stats():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    bn = FrozenBatchNorm(3, frozen=False)
    params = {"weight": jnp.ones((3,)), "bias": jnp.zeros((3,))}
    stats = {"running_mean": jnp.asarray([1.0, 2.0, 3.0]),
             "running_var": jnp.asarray([4.0, 1.0, 0.25])}
    y = bn.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    want = (x - np.array([1.0, 2.0, 3.0])) / np.sqrt(
        np.array([4.0, 1.0, 0.25]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


def test_frozen_layout_unchanged():
    """frozen=True (the default everywhere) keeps all four arrays in params
    — checkpoint-import compatibility must not drift."""
    bn = FrozenBatchNorm(3)
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 3)))
    assert set(variables) == {"params"}
    assert set(variables["params"]) == {
        "weight", "bias", "running_mean", "running_var"}


def test_trainable_bn_encoder_matches_torch():
    """Encoder-level oracle for the unfrozen-BN path: MobileNetV2 with
    frozen_bn=False in TRAIN mode (batch-moment normalisation + running-stat
    EMA) against the torch reference encoder in .train() mode — features AND
    post-forward running stats. The reference converts encoder BN to SyncBN
    when unfrozen (trainer.py:66-67); in one process SyncBatchNorm computes
    exactly nn.BatchNorm2d, so this pins the same semantics the SyncBN
    sharded test then extends across devices."""
    import os
    import sys

    torch = pytest.importorskip("torch")
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "networks")):
        pytest.skip("reference repo not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)

    from networks.encoders.mobilenetv2 import MobileNetV2 as RefMNv2

    from aot_tpu.models.encoders.mobilenetv2 import MobileNetV2
    from aot_tpu.utils.torch_import import _mobilenetv2_rules
    from tests.test_encoder_parity import (_convert_with_rules,
                                           _randomize_bn_stats)

    ref = RefMNv2(output_stride=16, norm_layer=torch.nn.BatchNorm2d)
    ref.train()
    _randomize_bn_stats(ref, seed=3)

    rng = np.random.RandomState(5)
    x = rng.rand(4, 65, 65, 3).astype(np.float32)

    mine = MobileNetV2(frozen_bn=False)
    variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "batch_stats" in variables
    rules = _mobilenetv2_rules(prefix_my="", prefix_t="")
    params = _convert_with_rules({"params": variables["params"]}, ref, rules)
    stats = _convert_with_rules(
        {"params": variables["batch_stats"]}, ref, rules)

    ys, mutated = mine.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), mutable=["batch_stats"])

    with torch.no_grad():
        want = [t.numpy() for t in
                ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    assert len(ys) == len(want)
    for got, w in zip(ys, want):
        np.testing.assert_allclose(np.asarray(got),
                                   w.transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-3)

    # running stats after ONE train-mode forward must match torch's
    # post-forward buffers (momentum 0.1, unbiased variance)
    want_stats = _convert_with_rules(
        {"params": mutated["batch_stats"]}, ref, rules)
    flat_got = jax.tree_util.tree_leaves(mutated["batch_stats"])
    flat_want = jax.tree_util.tree_leaves(want_stats)
    assert flat_got and len(flat_got) == len(flat_want)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_syncbn_sharded_equals_unsharded():
    """One sharded train step over a 2-device mesh produces the SAME
    running stats as the identical unsharded step — global-batch (SyncBN)
    semantics, not per-replica BN."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aot_tpu.configs import build_config
    from aot_tpu.engine.train import build_train_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.train.step import (create_train_state, make_train_step,
                                    shard_train_step)

    cfg = build_config(stage="pre", model="aott", exp_name="syncbn_test",
                       make_dirs=False, MODEL_FREEZE_BN=False,
                       TRAIN_REMAT=False)
    model = build_vos_model(cfg)
    engine = build_train_engine(model, cfg)

    t, b, hw = 2, 4, 65
    img = jnp.zeros((1, hw, hw, 3), jnp.float32)
    oh = jnp.zeros((1, hw, hw, cfg.MODEL_MAX_OBJ_NUM + 1),
                   jnp.float32).at[..., 0].set(1.0)
    variables = model.init(jax.random.PRNGKey(0), img, oh,
                           deterministic=True)
    assert "batch_stats" in variables

    # batch halves are NOT identical, so per-replica stats would differ
    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.rand(t, b, hw, hw, 3), jnp.float32)
    masks = jnp.asarray(rng.randint(0, 3, (t, b, hw, hw)), jnp.int32)
    obj_nums = jnp.full((b,), 2, jnp.int32)
    step_rng = jax.random.PRNGKey(3)

    # snapshot BEFORE the steps: donate_argnums deletes the originals
    init_flat = [np.array(x) for x in
                 jax.tree_util.tree_leaves(variables["batch_stats"])]

    def fresh_state():
        # fresh copies per run (the sharded step donates its input state)
        return create_train_state(
            cfg, jax.tree.map(jnp.array, variables["params"]),
            batch_stats=jax.tree.map(jnp.array, variables["batch_stats"]))

    train_step = make_train_step(cfg, engine, enable_id_shuffle=False)

    state1, _ = jax.jit(train_step, static_argnums=(5,))(
        fresh_state(), frames, masks, obj_nums, step_rng, False)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = shard_train_step(train_step, mesh, "data")
    st = jax.device_put(fresh_state(), NamedSharding(mesh, P()))
    state2, _ = sharded(st, frames, masks, obj_nums, step_rng, False)

    m1 = jax.tree.map(np.asarray, jax.device_get(state1.batch_stats))
    m2 = jax.tree.map(np.asarray, jax.device_get(state2.batch_stats))
    flat1 = jax.tree_util.tree_leaves(m1)
    flat2 = jax.tree_util.tree_leaves(m2)
    assert flat1 and len(flat1) == len(flat2)
    for a, c in zip(flat1, flat2):
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
    # and the stats actually moved off their init values
    moved = any(not np.allclose(a, i) for a, i in zip(flat1, init_flat))
    assert moved
