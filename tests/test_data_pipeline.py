"""Data pipeline semantics tests (host-side, no jax)."""

import numpy as np
import pytest

from aot_tpu.data.train_datasets import TEST, ConcatDataset, merge_clips
from aot_tpu.data.video_aug import (BalancedRandomCrop, PadToSize,
                                    RandomScale, build_train_transform,
                                    multi_restrict_size, restrict_size)
from aot_tpu.data.loader import TrainLoader, collate_clips


def _clip(obj_ids=(1, 2), t=3, h=40, w=50, seed=0):
    rng = np.random.RandomState(seed)
    frames = [rng.rand(h, w, 3).astype(np.float32) * 255 for _ in range(t)]
    lab = np.zeros((h, w), np.uint8)
    for i, o in enumerate(obj_ids):
        lab[5 + 12 * i:16 + 12 * i, 5:45] = o
    return dict(frames=frames, labels=[lab.copy() for _ in range(t)],
                obj_num=max(obj_ids) if obj_ids else 0)


def test_merge_clips_pastes_and_relabels():
    c1 = _clip(obj_ids=(1,))
    c2 = _clip(obj_ids=(2,), seed=1)
    merged = merge_clips(c1, c2, max_obj_n=10)
    lab = merged["labels"][0]
    # c2's object id 2 became (2 + 10) then re-compacted; ids are dense
    ids = sorted(np.unique(lab).tolist())
    assert ids[0] == 0 and ids == list(range(len(ids)))
    assert merged["obj_num"] == len(ids) - 1
    # foreground of c2 overwrote c1's pixels
    fg2 = c2["labels"][0] > 0
    np.testing.assert_allclose(merged["frames"][0][fg2], c2["frames"][0][fg2])


def test_merge_drops_small_objects():
    c1 = _clip(obj_ids=(1,))
    c2 = _clip(obj_ids=(), seed=1)
    c2["labels"] = [l.copy() for l in c2["labels"]]
    c2["labels"][0][0:3, 0:3] = 5  # 9 px < 100 -> dropped
    for l in c2["labels"][1:]:
        l[0:3, 0:3] = 5
    merged = merge_clips(c1, c2, max_obj_n=10)
    assert merged["obj_num"] == 1  # only c1's big object survives


def test_balanced_random_crop_relabels_and_counts():
    np.random.seed(0)
    clip = _clip(obj_ids=(3, 7), h=80, w=80)
    crop = BalancedRandomCrop((40, 40), max_obj_num=10)(clip)
    ids = sorted(np.unique(crop["labels"][0]).tolist())
    assert ids[0] == 0 and ids == list(range(len(ids)))  # compacted
    assert crop["obj_num"] == len(ids) - 1
    assert crop["frames"][0].shape == (40, 40, 3)


def test_pad_to_size_and_scale():
    clip = _clip(h=30, w=20)
    clip = PadToSize((48, 48))(clip)
    assert clip["frames"][0].shape == (48, 48, 3)
    assert clip["labels"][0].shape == (48, 48)
    clip2 = RandomScale(1.0, 1.0, short_edge=24)(_clip(h=30, w=20))
    assert min(clip2["frames"][0].shape[:2]) == 24


def test_restrict_size_snapping():
    # align_corners sizes are 16k+1 (reference video_transforms.py:640-648)
    h, w = restrict_size(480, 910, 1.0, None, 800 * 1.3, align_corners=True)
    assert (h - 1) % 16 == 0 and (w - 1) % 16 == 0
    h, w = restrict_size(480, 910, 1.0, None, 800 * 1.3, align_corners=False)
    assert h % 16 == 0 and w % 16 == 0


def test_multi_restrict_size_flip_expansion():
    img = np.random.RandomState(0).rand(64, 48, 3).astype(np.float32) * 255
    lab = np.zeros((64, 48), np.uint8)
    out = multi_restrict_size(img, lab, multi_scale=[1.0, 1.2], flip=True,
                              align_corners=True)
    assert len(out) == 4
    assert out[1]["flip"] and not out[0]["flip"]
    np.testing.assert_allclose(out[1]["image"], out[0]["image"][:, ::-1])


def test_synthetic_TEST_and_loader():
    from aot_tpu.configs import build_config

    cfg = build_config(stage="pre", model="aott")
    ds = TEST(seq_len=5, transform=build_train_transform(cfg))
    sample = ds[0]
    assert sample["frames"].shape == (5, 465, 465, 3)
    assert sample["frames"].dtype == np.uint8  # raw; normalised on device
    assert sample["labels"].shape == (5, 465, 465)
    assert int(sample["obj_num"]) == 3

    loader = TrainLoader(ds, batch_size=2, num_workers=0, seed=0)
    batch = next(iter(loader))
    assert batch["frames"].shape == (5, 2, 465, 465, 3)
    assert batch["labels"].dtype == np.int32
    assert batch["obj_nums"].shape == (2,)
    loader.close()


def test_loader_sharding_disjoint():
    ds = TEST(seq_len=2)
    a = TrainLoader(ds, 2, num_workers=0, seed=3, shard_id=0, num_shards=2)
    b = TrainLoader(ds, 2, num_workers=0, seed=3, shard_id=1, num_shards=2)
    ia = a._epoch_indices(0).reshape(-1)
    ib = b._epoch_indices(0).reshape(-1)
    assert set(ia).isdisjoint(set(ib))
    assert len(ia) == len(ib)


def test_color_jitter_preserves_brightness():
    """Regression: the jitter ops must each bind their own factor — a
    late-bound closure applied every enhance() with the tiny hue factor,
    silently blanking every StaticTrain/v2-aug image (found by the round-2
    e2e training run)."""
    import random

    from PIL import Image

    from aot_tpu.data.image_aug import ColorJitter

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(30, 220, (64, 64, 3), np.uint8))
    base = np.asarray(img, np.float32).mean()
    jit = ColorJitter(0.4, 0.4, 0.4, 0.1)
    random.seed(0)
    means = [np.asarray(jit(img), np.float32).mean() for _ in range(8)]
    for m in means:
        assert 0.5 * base < m < 1.6 * base, (m, base)
    # factors vary run to run (not all ops collapsed onto one factor)
    assert np.std(means) > 0.5


def test_static_train_frames_have_content():
    """StaticTrain samples must contain real image content (not blank)."""
    import os
    import tempfile

    from PIL import Image as PImage

    from aot_tpu.configs import build_config
    from aot_tpu.data.train_datasets import build_train_dataset

    rng = np.random.RandomState(1)
    with tempfile.TemporaryDirectory() as root:
        img_dir = os.path.join(root, "datasets/Static/JPEGImages/COCO")
        ann_dir = os.path.join(root, "datasets/Static/Annotations/COCO")
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        for i in range(2):
            PImage.fromarray(
                rng.randint(0, 255, (120, 160, 3), np.uint8)).save(
                    os.path.join(img_dir, f"{i}.jpg"))
            lab = np.zeros((120, 160), np.uint8)
            lab[30:80, 40:100] = 1
            PImage.fromarray(lab, "P").save(os.path.join(ann_dir, f"{i}.png"))
        cwd = os.getcwd()
        os.chdir(root)
        try:
            cfg = build_config(stage="pre", model="aott", exp_name="t",
                               make_dirs=False, DATASETS=["static"],
                               DATA_RANDOMCROP=(65, 65))
            ds = build_train_dataset(cfg)
            f = ds[0]["frames"]
        finally:
            os.chdir(cwd)
        assert f.dtype == np.uint8
        # random-noise source: a faithful pipeline keeps wide dynamic range
        assert f.max() > 100, f.max()
        assert f.astype(np.float32).std() > 10, f.astype(np.float32).std()
