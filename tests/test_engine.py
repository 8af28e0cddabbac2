"""Engine state-machine semantics tests (small shapes, CPU)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.configs import build_config
from aot_tpu.engine import build_infer_engine
from aot_tpu.engine.infer import (
    separate_mask,
    separated_obj_nums,
    soft_aggregate_logits,
)
from aot_tpu.engine.state import lt_write_slot, st_oldest_slot
from aot_tpu.models import build_vos_model

H = W = 65  # 16x grid: 5x5 (align_corners sizes are 16k+1)


@pytest.fixture(scope="module", params=["aott", "deaott"])
def setup(request):
    cfg = build_config(
        stage="pre", model=request.param,
        TEST_LONG_TERM_MEM_CAP=3, TEST_LONG_TERM_MEM_GAP=1,
        TEST_SHORT_TERM_MEM_SKIP=1, TEST_LONG_TERM_MEM_POLICY="fifo")
    model = build_vos_model(cfg, eval_mode=True)
    img = jnp.zeros((1, H, W, 3))
    oh = jnp.zeros((1, H, W, 11)).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img, oh)["params"]
    eng = build_infer_engine(model, cfg)
    return cfg, model, params, eng


def _ref_mask():
    m = np.zeros((1, H, W), np.int32)
    m[0, 5:25, 5:25] = 1
    m[0, 40:60, 40:60] = 2
    return jnp.asarray(m)


def test_video_loop_and_ring(setup):
    cfg, model, params, eng = setup
    img = jnp.linspace(0, 1, H * W * 3).reshape(1, H, W, 3)
    state = jax.jit(lambda p, i, m: eng.add_reference_frame(p, i, m, obj_num=2))(
        params, img, _ref_mask())
    assert int(state.lt_count[0]) == 1
    assert int(state.frame_step) == 0

    step = jax.jit(lambda p, s, i: eng.step(p, s, i, output_size=(H, W)))
    for t in range(5):
        state, pred, logits = step(params, state, img * (1 + 0.1 * t))
    assert pred.shape == (1, H, W)
    # step returns GRID-resolution aggregated logits (full-res argmax rides
    # the fused channel-first upsample; no caller consumed full-res logits)
    assert logits.shape == (1, (H - 1) // 4 + 1, (W - 1) // 4 + 1, 11)
    # gap=1 -> LT write every frame; cap=3 fifo -> count keeps increasing
    assert int(state.lt_count[0]) == 6
    assert int(state.frame_step) == 5
    # unused ids masked: argmax can never exceed obj_num
    assert int(jnp.max(pred)) <= 2
    # logits for ids > obj_num are hard-masked
    assert float(jnp.max(logits[..., 3:])) < -1e9


def test_deterministic_steps(setup):
    cfg, model, params, eng = setup
    img = jnp.ones((1, H, W, 3)) * 0.5
    add = jax.jit(lambda p, i, m: eng.add_reference_frame(p, i, m, obj_num=2))
    step = jax.jit(lambda p, s, i: eng.step(p, s, i, output_size=(H, W)))
    s1 = add(params, img, _ref_mask())
    s2 = add(params, img, _ref_mask())
    s1, p1, _ = step(params, s1, img)
    s2, p2, _ = step(params, s2, img)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_lt_write_slot_fifo():
    cap = 4
    slots = [int(lt_write_slot(jnp.asarray([c]), cap, "fifo")[0]) for c in range(9)]
    # fills 0..3 then cycles 1,2,3,1,2 (slot 0 = reference frame pinned)
    assert slots == [0, 1, 2, 3, 1, 2, 3, 1, 2]


def test_lt_write_slot_single():
    assert int(lt_write_slot(jnp.asarray([5]), 1, "fifo")[0]) == 0


def test_st_oldest_slot():
    skip = 3
    # after writes at ptr 0,1,2 with count 3 -> oldest is 0
    assert int(st_oldest_slot(jnp.asarray(2), jnp.asarray(3), skip)) == 0
    # count 1 -> oldest is ptr itself
    assert int(st_oldest_slot(jnp.asarray(1), jnp.asarray(1), skip)) == 1


def test_separate_mask_roundtrip():
    m = np.zeros((1, 8, 8), np.int32)
    m[0, 0, 0] = 1
    m[0, 1, 1] = 10
    m[0, 2, 2] = 11
    m[0, 3, 3] = 15
    sep = np.asarray(separate_mask(jnp.asarray(m), 2, 10))
    assert sep.shape == (2, 8, 8)
    assert sep[0, 0, 0] == 1 and sep[0, 1, 1] == 10
    assert sep[0, 2, 2] == 0 and sep[1, 2, 2] == 1 and sep[1, 3, 3] == 5
    assert separated_obj_nums(15, 2, 10) == [10, 5]
    assert separated_obj_nums(20, 2, 10) == [10, 10]


def test_soft_aggregation_matches_reference_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 4, 4, 11).astype(np.float32)
    got = np.asarray(soft_aggregate_logits(jnp.asarray(logits), 10))
    assert got.shape == (1, 4, 4, 21)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    bg = (probs[0, ..., 0] * probs[1, ..., 0])[None, ..., None]
    fg = np.concatenate([probs[0:1, ..., 1:], probs[1:2, ..., 1:]], axis=-1)
    merged = np.clip(np.concatenate([bg, fg], -1), 1e-5, 1 - 1e-5)
    want = np.log(merged / (1 - merged))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
