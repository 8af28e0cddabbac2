"""Native (C++) augmentation kernels vs the PIL oracle.

The native path must match PIL op-for-op where the math is identical
(enhance blends, relabel, identity warp) and closely where resampling
details differ (bilinear warp, the uint8 HSV roundtrip)."""

import random

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from aot_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="augkit failed to build")


def _rand_img(h=60, w=80, seed=0):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


def test_warp_identity_exact():
    img = _rand_img()
    out = native.warp_affine(img, [1, 0, 0, 0, 1, 0], img.shape[:2])
    assert np.array_equal(out, img)


def test_warp_matches_pil_bilinear():
    from aot_tpu.data.image_aug import _inv_affine_matrix
    img = _rand_img(120, 160, seed=1)
    m = _inv_affine_matrix((80, 60), angle=15, translate=(6, -4),
                           scale=1.05, shear=[5, 0])
    ours = native.warp_affine(img, m, (120, 160), fill=(124, 116, 104))
    ref = np.asarray(Image.fromarray(img).transform(
        (160, 120), Image.AFFINE, m, Image.BILINEAR,
        fillcolor=(124, 116, 104)), np.uint8)
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    # interiors agree to rounding; a one-pixel border band may differ
    # (PIL treats constant fill slightly differently at partial taps)
    assert np.mean(diff) < 1.0
    assert np.percentile(diff, 99) <= 2


def test_warp_mask_nearest_matches_pil():
    from aot_tpu.data.image_aug import _inv_affine_matrix
    mask = np.zeros((90, 110), np.uint8)
    mask[20:60, 30:80] = 3
    mask[50:80, 10:40] = 7
    m = _inv_affine_matrix((55, 45), angle=-12, translate=(3, 5),
                           scale=0.95, shear=[0, 4])
    ours = native.warp_affine(mask, m, (90, 110), fill=0, bilinear=False)
    ref = np.asarray(Image.fromarray(mask, "L").transform(
        (110, 90), Image.AFFINE, m, Image.NEAREST, fillcolor=0), np.uint8)
    agree = float(np.mean(ours == ref))
    assert agree > 0.995  # only rounding-boundary pixels may flip


def test_enhance_ops_match_pil():
    img = _rand_img(50, 70, seed=2)
    for name, fn, pil_fn in [
        ("brightness", native.brightness,
         lambda im, f: ImageEnhance.Brightness(im).enhance(f)),
        ("contrast", native.contrast,
         lambda im, f: ImageEnhance.Contrast(im).enhance(f)),
        ("saturation", native.saturation,
         lambda im, f: ImageEnhance.Color(im).enhance(f)),
    ]:
        for f in (0.85, 1.0, 1.15):
            ours = img.copy()
            fn(ours, f)
            ref = np.asarray(pil_fn(Image.fromarray(img), f), np.uint8)
            diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
            assert diff.max() <= 1, f"{name}({f}) max diff {diff.max()}"


def test_hue_matches_pil_roundtrip():
    from aot_tpu.data.image_aug import ColorJitter
    img = _rand_img(50, 70, seed=3)
    for f in (-0.03, 0.03, 0.1):
        ours = img.copy()
        native.hue(ours, f)
        ref = np.asarray(ColorJitter._hue_shift(Image.fromarray(img), f),
                         np.uint8)
        diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
        assert np.mean(diff) < 1.5, f"hue({f}) mean diff {np.mean(diff)}"
        assert np.percentile(diff, 99) <= 4


def test_grayscale_matches_pil():
    img = _rand_img(40, 40, seed=4)
    ours = img.copy()
    native.grayscale(ours)
    ref = np.asarray(Image.fromarray(img).convert("L").convert("RGB"),
                     np.uint8)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_relabel_matches_loop():
    mask = (np.random.RandomState(5).randint(0, 12, (64, 64))).astype(np.uint8)
    obj_list = [7, 2, 11]
    ours = native.relabel(mask, obj_list)
    ref = np.zeros_like(mask)
    for new_id, obj in enumerate(obj_list, start=1):
        ref[mask == obj] = new_id
    assert np.array_equal(ours, ref)


def test_native_jitter_clip_contract():
    """v2 video-aug jitter/gray via the native kernels keeps the clip
    contract: float32 frames, labels untouched, content preserved."""
    from aot_tpu.data.video_aug import (RandomColorJitterClip,
                                        RandomGrayScaleClip)

    rng = np.random.RandomState(7)
    clip = {
        "frames": [rng.rand(40, 50, 3).astype(np.float32) * 255
                   for _ in range(3)],
        "labels": [np.zeros((40, 50), np.uint8) for _ in range(3)],
    }
    jit = RandomColorJitterClip(p=1.0)
    out = jit(dict(clip))
    assert all(f.dtype == np.float32 and f.shape == (40, 50, 3)
               for f in out["frames"])
    assert out["labels"] is clip["labels"] or out["labels"] == clip["labels"]
    # p=1 with nonzero factors: frames actually changed
    assert any(not np.allclose(a, b)
               for a, b in zip(out["frames"], clip["frames"]))

    gray = RandomGrayScaleClip(p=1.0)
    out2 = gray(dict(clip))
    for f in out2["frames"]:
        assert np.array_equal(f[..., 0], f[..., 1])
        assert np.array_equal(f[..., 1], f[..., 2])


def test_static_train_native_end_to_end(tmp_path):
    """Native-backend StaticTrain yields content-bearing frames and
    consistent labels, same contract as the PIL backend."""
    import os

    from PIL import Image as PILImage

    from aot_tpu.data.train_datasets import StaticTrain

    root = tmp_path / "static"
    for sub in ("JPEGImages/COCO", "Annotations/COCO"):
        os.makedirs(root / sub)
    rng = np.random.RandomState(0)
    for k in range(2):
        img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        mask = np.zeros((120, 160), np.uint8)
        mask[30:90, 40:120] = 1
        mask[50:70, 60:90] = 2
        PILImage.fromarray(img).save(root / "JPEGImages/COCO" / f"{k}.jpg")
        PILImage.fromarray(mask, "P").save(
            root / "Annotations/COCO" / f"{k}.png")

    random.seed(0)
    ds = StaticTrain(str(root), (129, 129), seq_len=5, max_obj_n=10)
    assert ds.native_aug is not None
    s = ds[0]
    assert s["frames"].shape == (5, 129, 129, 3)
    assert s["frames"].dtype == np.uint8
    assert s["labels"].shape == (5, 129, 129)
    assert int(s["obj_num"]) >= 1
    # frames carry real content (std of a blank/fill frame would be ~0)
    assert float(s["frames"].std()) > 10
    assert set(np.unique(s["labels"])) <= set(range(11))

    # pil backend still available and produces the same contract
    ds_pil = StaticTrain(str(root), (129, 129), seq_len=5, max_obj_n=10,
                         aug_backend="pil")
    assert ds_pil.native_aug is None
    s2 = ds_pil[0]
    assert s2["frames"].shape == (5, 129, 129, 3)

    # v2 aug (RandomApply-wrapped jitter + grayscale + blur) on the native
    # path
    ds_v2 = StaticTrain(str(root), (129, 129), seq_len=5, max_obj_n=10,
                        aug_type="v2")
    assert ds_v2.native_aug is not None
    s3 = ds_v2[0]
    assert s3["frames"].shape == (5, 129, 129, 3)
    assert float(s3["frames"].std()) > 10
