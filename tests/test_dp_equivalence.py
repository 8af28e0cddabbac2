"""Data-parallel training equivalence: one sharded train step over a
2-device mesh produces the SAME loss / grad-norm / updated params as the
identical single-device step on the same global batch.

This is the correctness contract the reference gets implicitly from DDP's
gradient allreduce (networks/managers/trainer.py:69-74): data parallelism
must be a pure implementation detail — it shards the batch and averages
gradients, never the result. It backs the driver's virtual-mesh
`dryrun_multichip` with an always-runnable pytest.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aot_tpu.configs import build_config
from aot_tpu.engine.train import build_train_engine
from aot_tpu.models import build_vos_model
from aot_tpu.train.step import (create_train_state, make_train_step,
                                shard_train_step)


def test_dp_sharded_step_equals_single_device():
    cfg = build_config(stage="pre", model="aott", exp_name="dp_equiv_test",
                       make_dirs=False, TRAIN_REMAT=False,
                       TRAIN_LONG_TERM_MEM_CAP=2)
    model = build_vos_model(cfg)
    engine = build_train_engine(model, cfg)

    t, b, hw = 2, 2, 33
    img = jnp.zeros((1, hw, hw, 3), jnp.float32)
    oh = jnp.zeros((1, hw, hw, cfg.MODEL_MAX_OBJ_NUM + 1),
                   jnp.float32).at[..., 0].set(1.0)
    params = model.init(jax.random.PRNGKey(0), img, oh,
                        deterministic=True)["params"]

    # the two batch halves differ, so a lost/miscaled gradient allreduce
    # could not cancel out
    rng = np.random.RandomState(4)
    frames = jnp.asarray(rng.rand(t, b, hw, hw, 3), jnp.float32)
    masks = jnp.asarray(rng.randint(0, 3, (t, b, hw, hw)), jnp.int32)
    obj_nums = jnp.full((b,), 2, jnp.int32)
    step_rng = jax.random.PRNGKey(5)

    def fresh_state():
        # fresh copies per run (the sharded step donates its input state)
        return create_train_state(cfg, jax.tree.map(jnp.array, params))

    # id shuffle off: the permutation is drawn per global batch element from
    # the same key either way, but keeping the program deterministic makes
    # a mismatch here attributable to sharding alone. Dropout/droppath stay
    # ON (same key, batch-position-indexed), exercising rng under sharding.
    train_step = make_train_step(cfg, engine, enable_id_shuffle=False)

    state1, stats1 = jax.jit(train_step, static_argnums=(5,))(
        fresh_state(), frames, masks, obj_nums, step_rng, False)
    loss1 = float(stats1["loss"])
    gn1 = float(stats1["grad_norm"])
    p1 = jax.tree.map(np.asarray, jax.device_get(state1.params))

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = shard_train_step(train_step, mesh, "data")
    st = jax.device_put(fresh_state(), NamedSharding(mesh, P()))
    state2, stats2 = sharded(st, frames, masks, obj_nums, step_rng, False)
    loss2 = float(stats2["loss"])
    gn2 = float(stats2["grad_norm"])
    p2 = jax.tree.map(np.asarray, jax.device_get(state2.params))

    # loss is a mean over the batch; grads are psum-of-partial-means — both
    # must agree with the single-device computation to fp32 reassociation
    # tolerance
    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    np.testing.assert_allclose(gn1, gn2, rtol=1e-4)

    flat1, treedef1 = jax.tree_util.tree_flatten(p1)
    flat2, treedef2 = jax.tree_util.tree_flatten(p2)
    assert treedef1 == treedef2 and flat1
    # atol 5e-5 ~ 12% of one lr-unit (PRE lr 4e-4): Adam's step-1 update is
    # ~lr*sign(g), so fp32 grad-reassociation noise near g=0 shows up at
    # this scale (observed max 2e-5 on 1/256 elements of one leaf); a lost
    # or mis-scaled allreduce would be O(lr), 10-100x larger
    for a, c in zip(flat1, flat2):
        np.testing.assert_allclose(a, c, rtol=1e-3, atol=5e-5)

    # and the step actually trained: params moved off their init values
    init_flat = jax.tree_util.tree_leaves(
        jax.tree.map(np.asarray, jax.device_get(params)))
    moved = any(not np.allclose(a, i) for a, i in zip(flat1, init_flat))
    assert moved
