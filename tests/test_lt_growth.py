"""Long-term-memory 'grow' policy: bucketed capacity growth must reproduce
the reference's unbounded memory exactly (aot_engine.py:291-305 concatenates
forever; here the ring re-buckets to the next power of two just in time, so
a long all-frames video never evicts)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.configs import build_config
from aot_tpu.engine import build_infer_engine
from aot_tpu.models import build_vos_model

H = W = 65
FRAMES = 9  # gap=1 -> 9 LT writes + ref frame; initial cap 2 grows to 16


def _build(policy, cap):
    cfg = build_config(
        stage="pre", model="aott",
        TEST_LONG_TERM_MEM_CAP=cap, TEST_LONG_TERM_MEM_GAP=1,
        TEST_SHORT_TERM_MEM_SKIP=1, TEST_LONG_TERM_MEM_POLICY=policy)
    model = build_vos_model(cfg, eval_mode=True)
    img = jnp.zeros((1, H, W, 3))
    oh = jnp.zeros((1, H, W, 11)).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img, oh)["params"]
    return build_infer_engine(model, cfg), params


def _frames():
    rng = np.random.RandomState(3)
    base = rng.rand(1, H, W, 3).astype(np.float32)
    drift = rng.rand(FRAMES, 1, H, W, 3).astype(np.float32) * 0.2
    return jnp.asarray(base), [jnp.asarray(base * 0.8 + d) for d in drift]


def _mask():
    m = np.zeros((1, H, W), np.int32)
    m[0, 5:30, 5:30] = 1
    m[0, 40:60, 35:60] = 2
    return jnp.asarray(m)


def _run(eng, params, policy_grow: bool):
    img0, frames = _frames()
    add = jax.jit(lambda p, i, m: eng.add_reference_frame(p, i, m, obj_num=2))
    step = jax.jit(lambda p, s, i: eng.step(p, s, i, output_size=(H, W)))
    state = add(params, img0, _mask())
    shadow = eng.make_shadow()
    shadow.add_ref(0)
    logits_all = []
    for t, f in enumerate(frames, start=1):
        if policy_grow and shadow.will_write(t):
            state = eng.ensure_lt_capacity(state, shadow.count + 1)
        state, pred, logits = step(params, state, f)
        shadow.update(t)
        logits_all.append(np.asarray(logits))
    return state, shadow, logits_all


@pytest.mark.slow
def test_grow_matches_uncapped_oracle():
    """Growing from cap=2 must give bit-comparable logits to a buffer
    pre-sized large enough to never evict (the uncapped oracle)."""
    eng_g, params = _build("grow", 2)
    eng_big, _ = _build("stop", 16)  # same slot sequence, never full

    state_g, shadow, logits_g = _run(eng_g, params, policy_grow=True)
    state_b, _, logits_b = _run(eng_big, params, policy_grow=False)

    # every write landed; nothing was evicted
    assert int(state_g.lt_count[0]) == FRAMES + 1
    assert eng_g.lt_cap(state_g) >= FRAMES + 1
    assert shadow.count == int(state_g.lt_count[0])  # host mirror is exact

    for t, (a, b) in enumerate(zip(logits_g, logits_b)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                   err_msg=f"frame {t + 1}")


def test_fifo_diverges_once_evicting():
    """Sanity: the bounded fifo policy really does evict (so the grow test
    above is meaningfully exercising growth)."""
    eng_f, params = _build("fifo", 2)
    eng_big, _ = _build("stop", 16)
    _, _, logits_f = _run(eng_f, params, policy_grow=False)
    _, _, logits_b = _run(eng_big, params, policy_grow=False)
    assert not np.allclose(logits_f[-1], logits_b[-1], rtol=1e-5, atol=1e-5)


def test_ensure_capacity_noop_for_bounded_policies():
    eng_f, params = _build("fifo", 2)
    img0, _ = _frames()
    add = jax.jit(lambda p, i, m: eng_f.add_reference_frame(p, i, m,
                                                            obj_num=2))
    state = add(params, img0, _mask())
    grown = eng_f.ensure_lt_capacity(state, 100)
    assert eng_f.lt_cap(grown) == eng_f.lt_cap(state) == 2
