"""Parity tests for image ops vs torch CPU oracles.

torch is used ONLY as a numerical oracle here; the framework itself never
imports it outside checkpoint converters.
"""

import numpy as np
import pytest

from aot_tpu.ops.image import (
    flip_horizontal,
    interpolate_bilinear,
    interpolate_nearest,
    one_hot_mask,
    generate_permute_matrix,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((30, 30), (120, 120)), ((29, 31), (464, 496)), ((17, 13), (5, 9)), ((8, 8), (8, 8))],
)
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)  # NHWC
    got = np.asarray(interpolate_bilinear(x, out_hw, align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 12, 2).astype(np.float32)
    got = np.asarray(interpolate_nearest(x, (4, 4)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(4, 4), mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_one_hot_mask():
    mask = np.array([[[0, 1], [2, 5]]], dtype=np.int32)  # (1, 2, 2)
    oh = np.asarray(one_hot_mask(mask, 10))
    assert oh.shape == (1, 2, 2, 11)
    assert oh[0, 0, 0, 0] == 1 and oh[0, 1, 1, 5] == 1
    assert oh.sum() == 4


def test_flip():
    x = np.arange(12, dtype=np.float32).reshape(1, 2, 3, 2)
    got = np.asarray(flip_horizontal(x))
    np.testing.assert_allclose(got, x[:, :, ::-1])


def test_permute_matrix_keeps_background():
    import jax

    m = np.asarray(generate_permute_matrix(jax.random.PRNGKey(0), 11, 4))
    assert m.shape == (4, 11, 11)
    # row 0 is pinned to identity (background id never shuffles)
    np.testing.assert_allclose(m[:, 0, 0], np.ones(4))
    # each matrix is a permutation
    np.testing.assert_allclose(m.sum(1), np.ones((4, 11)))
    np.testing.assert_allclose(m.sum(2), np.ones((4, 11)))


def test_pack_labels_4bit_roundtrip():
    from aot_tpu.ops.image import pack_labels_4bit, unpack_labels_4bit_np

    rng = np.random.RandomState(0)
    for shape in [(3, 1, 7, 11), (2, 5, 8), (1, 465, 465)]:
        labels = rng.randint(0, 16, shape).astype(np.uint8)
        packed = np.asarray(pack_labels_4bit(labels))
        assert packed.dtype == np.uint8
        assert packed.shape == shape[:-1] + ((shape[-1] + 1) // 2,)
        got = unpack_labels_4bit_np(packed, shape[-1])
        np.testing.assert_array_equal(got, labels)
