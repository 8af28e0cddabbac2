"""Batched multi-video serving: N independent videos stepped in one
dispatch (VOSInferEngine.step_videos) must produce the same masks as
stepping each video alone — rows of the engine batch never interact.

TPU-native replacement for the reference's multi-GPU eval work queue
(networks/managers/evaluator.py:216-235): idle MXU becomes throughput.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aot_tpu.configs import build_config
from aot_tpu.engine import build_infer_engine
from aot_tpu.models import build_vos_model


def _make_videos(n, size, frames, seed=7):
    rng = np.random.RandomState(seed)
    vids, masks, obj_nums = [], [], []
    for v in range(n):
        vids.append(rng.rand(frames, size, size, 3).astype(np.float32) * 255)
        m = np.zeros((size, size), np.int32)
        objs = v % 3 + 1
        for o in range(objs):
            y = 5 + 14 * o
            m[y:y + 10, 5 + 9 * o:5 + 9 * o + 30] = o + 1
        masks.append(m)
        obj_nums.append(objs)
    return vids, masks, obj_nums


def test_step_videos_matches_per_video():
    n, size, frames = 3, 49, 5
    cfg = build_config(stage="pre", model="aott",
                       TEST_LONG_TERM_MEM_GAP=2,
                       TEST_LONG_TERM_MEM_CAP=2,
                       TEST_LONG_TERM_MEM_POLICY="fifo")
    model = build_vos_model(cfg, eval_mode=True)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, size, size, 11)))["params"]
    eng = build_infer_engine(model, cfg)

    vids, masks, obj_nums = _make_videos(n, size, frames)

    # per-video stepping (the scalar serving path)
    solo_preds = [[] for _ in range(n)]
    step1 = jax.jit(lambda p, s, i: eng.step(p, s, i,
                                             output_size=(size, size)))
    for v in range(n):
        st = eng.add_reference_frame(
            params, jnp.asarray(vids[v][:1]),
            jnp.asarray(masks[v][None]), obj_num=obj_nums[v])
        for f in range(1, frames):
            st, pred, _ = step1(params, st, jnp.asarray(vids[v][f:f + 1]))
            solo_preds[v].append(np.asarray(pred[0]))

    # batched stepping: one dispatch per frame for all n videos
    stepN = jax.jit(lambda p, s, i: eng.step_videos(
        p, s, i, orig_size=(size, size)))
    st = eng.add_reference_frames_videos(
        params, jnp.asarray(np.stack([v[0] for v in vids])),
        jnp.asarray(np.stack(masks)), obj_nums)
    for f in range(1, frames):
        st, preds = stepN(params, st,
                          jnp.asarray(np.stack([v[f] for v in vids])))
        preds = np.asarray(preds)
        for v in range(n):
            np.testing.assert_array_equal(
                preds[v], solo_preds[v][f - 1],
                err_msg=f"video {v} frame {f}")

    # masks actually contain the objects (not a trivially-empty agreement)
    assert any(p.max() > 0 for v in solo_preds for p in v)


@pytest.mark.slow
def test_evaluator_video_batch_matches_scalar(tmp_path):
    """tools/eval.py --video_batch N end-to-end: the batched evaluator path
    (ragged lengths, LT ring growth, PNG export) writes byte-identical
    masks to the scalar per-video path."""
    import os

    from PIL import Image

    from aot_tpu.eval.evaluator import Evaluator
    from tests.test_eval_chunked import _Seq

    class _VSeq(_Seq):
        """Per-video content (distinct rows — a row-mixup must not cancel)."""

        def __init__(self, seed, **kw):
            super().__init__(**kw)
            self.seed = seed

        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            rng = np.random.RandomState(self.seed * 10000 + idx)
            s["image"] = (rng.rand(*s["image"].shape) * 255).astype(
                np.float32)
            return s

    def run(video_batch, tag):
        cfg = build_config(stage="pre", model="aott", TEST_DATASET="test",
                           TEST_VIDEO_BATCH=video_batch,
                           TEST_LONG_TERM_MEM_GAP=2,
                           TEST_LONG_TERM_MEM_CAP=2)
        cfg.TEST_MULTISCALE = [1.0]
        model = build_vos_model(cfg, eval_mode=True)
        size = 65
        params = jax.jit(partial(model.init, deterministic=True))(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, size, size, 11)))["params"]
        ev = Evaluator(cfg, model, params,
                       result_root=str(tmp_path / tag))
        # 3 videos, ragged lengths, all annotated at frame 0 only
        seqs = [_VSeq(seed=i + 1, size=size, n_frames=nf, mid_label_at=None)
                for i, nf in enumerate((6, 8, 8))]
        for i, s in enumerate(seqs):
            s.seq_name = f"vb{i}"
        if video_batch > 1:
            stats = ev.eval_sequences_batched(seqs)
        else:
            stats = [ev.eval_sequence(s) for s in seqs]
        assert [s["timed_frames"] for s in stats] == [5, 7, 7]
        out = {}
        for i, s in enumerate(seqs):
            d = os.path.join(str(tmp_path / tag), s.seq_name)
            for f in sorted(os.listdir(d)):
                out[f"{s.seq_name}/{f}"] = np.array(
                    Image.open(os.path.join(d, f)))
        return out

    a = run(1, "scalar")
    b = run(3, "batched")
    assert a.keys() == b.keys() and len(a) == 19
    for f in a:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)
