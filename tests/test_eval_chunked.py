"""Chunked eval stepping (TEST_FRAME_CHUNK > 1) must be mask-identical to
per-frame stepping.

engine.step_chunk scans K fused per-frame steps on device (one upload, one
readback) over label-free stretches; annotated frames break the chunk and go
through the scalar re-reference path. The reference has no analogue — it
steps frame-by-frame with a device sync per frame (evaluator.py:408 region);
chunking is the TPU-idiomatic replacement for that cadence.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.configs import build_config
from aot_tpu.eval.evaluator import Evaluator
from aot_tpu.models import build_vos_model


class _Seq:
    """Deterministic random-image sequence; GT at frames 0 and 5 (the
    mid-video label forces a chunk break + re-reference)."""

    def __init__(self, size=65, n_frames=11, mid_label_at=5):
        self.seq_name = "chunkseq"
        self.num_frames = n_frames
        self.size = size
        self.mid = mid_label_at
        self.obj_nums = [2] * n_frames
        self.obj_indices = [[0, 1, 2]] * n_frames
        self.images = [f"{i:05d}.jpg" for i in range(n_frames)]
        self.labels = ["00000.png"]
        if mid_label_at is not None:
            self.labels.append(f"{mid_label_at:05d}.png")

    def __len__(self):
        return self.num_frames

    def __getitem__(self, idx):
        s = self.size
        rng = np.random.RandomState(1000 + idx)
        image = (rng.rand(s, s, 3) * 255).astype(np.float32)
        label = None
        if idx == 0 or idx == self.mid:
            label = np.zeros((s, s), np.uint8)
            label[5:25, 5:25] = 1
            label[35:60, 35:60] = 2
        return {
            "image": image,
            "label": label,
            "meta": {
                "seq_name": self.seq_name,
                "frame_num": self.num_frames,
                "obj_num": 2,
                "current_name": self.images[idx],
                "height": s,
                "width": s,
                "obj_idx": [0, 1, 2],
            },
        }


def _run(tmp_path, chunk, seq, lt_gap=2, lt_cap=2, tag="", flip=False):
    cfg = build_config(stage="pre", model="aott", TEST_DATASET="test",
                       TEST_FRAME_CHUNK=chunk,
                       TEST_LONG_TERM_MEM_GAP=lt_gap,
                       TEST_LONG_TERM_MEM_CAP=lt_cap,
                       TEST_FLIP=flip)
    cfg.TEST_MULTISCALE = [1.0]
    model = build_vos_model(cfg, eval_mode=True)
    h = w = seq.size
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 11)))["params"]
    root = str(tmp_path / f"chunk{chunk}{tag}")
    ev = Evaluator(cfg, model, params, result_root=root)
    stats = ev.eval_sequence(seq)
    assert stats["timed_frames"] == len(seq) - 1
    out = {}
    d = os.path.join(root, seq.seq_name)
    from PIL import Image

    for f in sorted(os.listdir(d)):
        out[f] = np.array(Image.open(os.path.join(d, f)))
    return out


@pytest.mark.slow
def test_chunked_matches_per_frame(tmp_path):
    """chunk=4 over an 11-frame video with a mid-video GT label: chunks of
    4+1(labeled)+4+1, LT ring grows INSIDE a chunk (gap=2, cap=2) — masks
    must be byte-identical to per-frame stepping."""
    a = _run(tmp_path, 1, _Seq())
    b = _run(tmp_path, 4, _Seq())
    assert a.keys() == b.keys() and len(a) == 10
    for f in a:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


@pytest.mark.slow
def test_tta_bypasses_chunking(tmp_path):
    """TEST_FRAME_CHUNK is single-variant-only: with flip TTA enabled the
    evaluator must silently take the scalar multi-variant path and produce
    the same masks whatever the chunk setting."""
    a = _run(tmp_path, 1, _Seq(mid_label_at=None), tag="f1", flip=True)
    b = _run(tmp_path, 8, _Seq(mid_label_at=None), tag="f8", flip=True)
    assert a.keys() == b.keys() and len(a) == 10
    for f in a:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


@pytest.mark.slow
def test_chunk_larger_than_video(tmp_path):
    """chunk cap beyond the video length: powers-of-two decomposition
    (8+2 for the 10 label-free frames) still covers every frame."""
    seq = _Seq(mid_label_at=None)
    a = _run(tmp_path, 1, seq, tag="a")
    b = _run(tmp_path, 16, _Seq(mid_label_at=None), tag="b")
    assert a.keys() == b.keys() and len(a) == 10
    for f in a:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)
