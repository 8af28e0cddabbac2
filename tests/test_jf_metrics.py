"""J&F metric sanity tests (host-side)."""

import numpy as np

from aot_tpu.eval.metrics import (binary_iou, boundary_f_measure,
                                  evaluate_sequence)


def _square(h=100, w=100, y0=20, x0=20, size=40, obj=1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y0 + size, x0:x0 + size] = obj
    return m


def test_perfect_prediction():
    masks = [_square() for _ in range(6)]
    s = evaluate_sequence(masks, masks)
    assert s["J"] == 1.0 and s["F"] == 1.0 and s["J&F"] == 1.0


def test_shifted_square_iou():
    gt = _square(y0=20, x0=20, size=40)
    pred = _square(y0=20, x0=30, size=40)  # 10px x-shift: inter 40x30
    iou = binary_iou(pred == 1, gt == 1)
    expected = (40 * 30) / (2 * 1600 - 40 * 30)
    np.testing.assert_allclose(iou, expected, rtol=1e-6)
    seqs = [gt, pred, pred, gt]  # frames 1..2 evaluated
    s = evaluate_sequence(seqs, [gt] * 4)
    np.testing.assert_allclose(s["J"], expected, rtol=1e-6)


def test_boundary_f_tolerance():
    gt = _square(size=40)
    # 1px dilation of the square: boundary within tolerance -> F stays 1
    near = _square(y0=19, x0=19, size=42)
    assert boundary_f_measure(near == 1, gt == 1, bound_th=0.05) == 1.0
    # far-off prediction -> F = 0
    far = _square(y0=70, x0=70, size=20)
    assert boundary_f_measure(far == 1, gt == 1) == 0.0


def test_empty_cases():
    empty = np.zeros((50, 50), np.uint8)
    full = _square(50, 50, 10, 10, 20)
    assert binary_iou(empty == 1, empty == 1) == 1.0
    assert boundary_f_measure(empty == 1, empty == 1) == 1.0
    assert boundary_f_measure(empty == 1, full == 1) == 0.0


def test_multi_object():
    gt = _square(obj=1) + _square(y0=60, x0=60, size=20, obj=2)
    pred_good1 = _square(obj=1)  # object 2 missed entirely
    s = evaluate_sequence([gt, pred_good1, gt], [gt, gt, gt])
    assert s["n_objects"] == 2
    np.testing.assert_allclose(s["J"], 0.5, atol=1e-6)
