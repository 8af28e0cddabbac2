"""Training-forward loss parity against the reference AOTEngine.forward
(/root/reference/networks/engines/aot_engine.py:33-107).

Both sides run deterministically (droppath/dropout zeroed via config, torch
model in eval mode), same converted weights, same 5-frame clip, GT-mask
curriculum (use_prev_pred=False) -> scalar AND per-frame losses must match.
Covers AOT + DeAOT and the TRAIN_ENABLE_PREV_FRAME recipe (reference
set_prev_frame, aot_engine.py:253-289).
"""

import os
import sys
from functools import partial

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference repo not mounted")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

from tests.test_torch_parity import _fixed_v3_forward  # noqa: E402

T, B = 5, 2
STEP = 100


def _size(model_name):
    # align_corners models run on 16k+1 grids, others on 16k (matches
    # tests/test_torch_parity.py sizing)
    return 65 if not model_name.startswith("deaot") else 64


def _clip(h, w):
    rng = np.random.RandomState(0)
    frames = rng.rand(T, B, h, w, 3).astype(np.float32)
    masks = np.zeros((T, B, h, w), np.int64)
    for t in range(T):
        o = 8 + 2 * t
        masks[t, :, o:o + 20, o:o + 20] = 1
        masks[t, :, 40:58, 35:60] = 2
    return frames, masks, [2, 2]


def _run_reference(model_name, enable_prev_frame):
    h = w = _size(model_name)
    import networks.layers.attention as ref_att

    ref_att.MultiheadLocalAttentionV3.forward = _fixed_v3_forward

    from configs.default import DefaultEngineConfig

    ref_cfg = DefaultEngineConfig("parity", model_name)
    ref_cfg.TRAIN_LSTT_DROPPATH = 0.0

    import networks.models as ref_models
    from networks.engines import build_engine as ref_build_engine

    ref_model = ref_models.build_vos_model(ref_cfg.MODEL_VOS, ref_cfg)
    ref_engine = ref_build_engine(
        ref_cfg.MODEL_ENGINE, "train", aot_model=ref_model, gpu_id=0,
        long_term_mem_gap=ref_cfg.TRAIN_LONG_TERM_MEM_GAP)
    ref_engine.eval()  # disables dropout; losses still computed

    frames, masks, obj_nums = _clip(h, w)
    tf = torch.from_numpy(
        frames.reshape(T * B, h, w, 3).transpose(0, 3, 1, 2).copy())
    tm = torch.from_numpy(masks.reshape(T * B, 1, h, w).copy())
    with torch.no_grad():
        ref_engine.restart_engine(batch_size=B, enable_id_shuffle=False)
        ref_loss, _, ref_frame_losses, _ = ref_engine(
            tf, tm.float(), B, obj_nums, step=STEP,
            enable_prev_frame=enable_prev_frame)
    per_frame = [float(fl.mean()) for fl in ref_frame_losses]
    return ref_model, float(ref_loss.mean()), per_frame


def _run_mine(model_name, ref_model, enable_prev_frame):
    import jax
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.engine.train import build_train_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.torch_import import convert_state_dict

    my_cfg = build_config(stage="ytb", model=model_name,
                          TRAIN_DTYPE="float32", TRAIN_LSTT_DROPPATH=0.0)
    h = w = _size(model_name)
    my_model = build_vos_model(my_cfg)
    img0 = jnp.zeros((1, h, w, 3))
    oh0 = jnp.zeros((1, h, w, 11)).at[..., 0].set(1.0)
    variables = jax.jit(partial(my_model.init, deterministic=True))(
        jax.random.PRNGKey(0), img0, oh0)
    params, missing, _ = convert_state_dict(
        ref_model.state_dict(), variables["params"], my_cfg)
    assert not [m for m in missing if "running" not in m]

    frames, masks, obj_nums = _clip(h, w)
    eng = build_train_engine(my_model, my_cfg)
    # deterministic=True mirrors ref_engine.eval(): the reference's DWConv2d
    # carries a hardcoded Dropout2d(p=0.1) (basic.py:38-57) that eval() turns
    # off; real training keeps it on in BOTH frameworks.
    fwd = jax.jit(lambda p, f, m, o: eng.forward(
        p, f, m, o, float(STEP), enable_prev_frame=enable_prev_frame,
        deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(1),
              "droppath": jax.random.PRNGKey(2)}))
    loss, stats = fwd(params, jnp.asarray(frames),
                      jnp.asarray(masks.astype(np.int32)),
                      jnp.asarray(obj_nums, jnp.int32))
    return float(loss), stats


@pytest.mark.parametrize("model_name", ["aott", "deaott"])
def test_training_loss_parity(model_name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ref_model, ref_loss, ref_per_frame = _run_reference(model_name, False)
    my_loss, stats = _run_mine(model_name, ref_model, False)

    np.testing.assert_allclose(my_loss, ref_loss, rtol=5e-3, atol=5e-3)

    # per-frame loss vector (reference all_frame_loss = [aux] + curr,
    # aot_engine.py:100-105; mine stats['frame_losses'] = [aux_mean] + scan)
    mine_pf = np.asarray(stats["frame_losses"])
    assert mine_pf.shape[0] == len(ref_per_frame) == T
    np.testing.assert_allclose(mine_pf, ref_per_frame, rtol=5e-3, atol=5e-3)


def test_training_loss_parity_prev_frame(tmp_path, monkeypatch):
    """TRAIN_ENABLE_PREV_FRAME: frame 1 is GT-seeded as a second reference
    (reference: aot_engine.py:62-69 + set_prev_frame 253-289)."""
    monkeypatch.chdir(tmp_path)
    ref_model, ref_loss, ref_per_frame = _run_reference("aott", True)
    my_loss, stats = _run_mine("aott", ref_model, True)

    np.testing.assert_allclose(my_loss, ref_loss, rtol=5e-3, atol=5e-3)
    # reference splits [ref_aux, prev_aux] + (T-2) curr; mine collapses the
    # two aux losses into frame_losses[0] = their mean
    mine_pf = np.asarray(stats["frame_losses"])
    assert mine_pf.shape[0] == T - 1
    np.testing.assert_allclose(mine_pf[0], np.mean(ref_per_frame[:2]),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(mine_pf[1:], ref_per_frame[2:],
                               rtol=5e-3, atol=5e-3)
