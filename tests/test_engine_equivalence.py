"""Cross-framework engine equivalence (small, CI-sized): the reference
torch inference engine and this framework must produce identical argmax
masks frame by frame on the same video with converted weights.

The full-size runs (30 frames, Demo real clips, all model families, group
splitting) live in tools/engine_equivalence.py; artifacts/equiv_*.json
records their results.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference repo not mounted")

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.engine_equivalence import (  # noqa: E402
    build_reference,
    build_mine,
    compare,
    make_synthetic_video,
    run_clip_tta,
    run_mine,
    run_reference,
)


def test_engine_equivalence_aott(tmp_path, monkeypatch):
    """10 frames, new object arriving at frame 4, LT writes every 2 frames,
    including capacity growth from the initial bucket."""
    monkeypatch.chdir(tmp_path)
    frames, h, w, arrive, gap = 10, 65, 65, 4, 2
    imgs, lab0, new = make_synthetic_video(frames, h, w, 2, 1, arrive, 0)
    ref_cfg, ref_model = build_reference("aott")
    my_cfg, eng, params = build_mine("aott", gap, 1, ref_model)
    ref_preds, ref_logits = run_reference(
        ref_cfg, ref_model, imgs, lab0, new, arrive, gap, 1)
    my_preds, my_logits = run_mine(eng, params, imgs, lab0, new, arrive)
    per_frame = compare(ref_preds, my_preds, ref_logits, my_logits, 3)
    worst = min(f["agree"] for f in per_frame)
    assert worst >= 0.999, per_frame
    worst_logit = max(f.get("logit_max_abs_diff", 0) for f in per_frame)
    assert worst_logit < 1e-3, per_frame


@pytest.mark.slow
def test_evaluator_tta_equivalence(tmp_path, monkeypatch):
    """Multi-scale + flip TTA: the real Evaluator vs the reference
    evaluator's multi-aug loop (evaluator.py:270-446)."""
    monkeypatch.chdir(tmp_path)
    frames, h, w, arrive, gap = 6, 65, 65, 3, 2
    imgs, lab0, new = make_synthetic_video(frames, h, w, 2, 1, arrive, 1,
                                           normalize=False)
    outdir = str(tmp_path / "tta_out")
    os.makedirs(outdir, exist_ok=True)
    per_frame = run_clip_tta("aott", imgs, lab0, new, arrive, gap, 1,
                             scales=[1.0, 1.3], flip=True, outdir=outdir)
    worst = min(f["agree"] for f in per_frame)
    assert worst >= 0.999, per_frame
