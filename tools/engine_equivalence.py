"""Cross-framework engine-equivalence harness.

Drives the PyTorch reference's inference engine (imported read-only from
/root/reference, CPU) and this framework's VOSInferEngine over IDENTICAL
videos with CONVERTED weights, then compares per-frame argmax masks.

This is the strongest accuracy validation available in this image: no
MODEL_ZOO checkpoints or DAVIS/YTB data are mounted (datasets/ holds README
stubs only), so instead of one J&F number we assert the two engines make the
same per-pixel decisions frame by frame — through reference-frame encoding,
short/long-term memory updates (reference: networks/engines/aot_engine.py:
188-340), LT-gap writes, mid-video new-object arrival with re-referencing
(reference: networks/managers/evaluator.py:363-399), and soft aggregation of
>max_obj_num object groups (aot_engine.py:565-582).

Videos:
  * synthetic multi-object clips (moving textured blobs, one object arriving
    mid-video), seeded and deterministic;
  * the mounted real Demo clips (/root/reference/datasets/Demo) resized
    small, first-frame masks as reference.

Run:  python tools/engine_equivalence.py [--model aott] [--frames 30] ...
Exit code 0 iff every frame of every clip agrees >= --min-agree.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("AOT_REFERENCE", "/root/reference")
if REPO not in sys.path:
    sys.path.insert(0, REPO)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# --dtype: override this framework's TEST_DTYPE while the torch reference
# stays fp32 — measures the mask-agreement cost of bf16 serving.
DTYPE_OVERRIDE = None
# --attn_impl: override ATTN_IMPL ('window' forces the TPU serving
# formulation of local attention on the CPU backend, so the equivalence run
# exercises the exact dispatch that serves on TPU).
ATTN_IMPL_OVERRIDE = None


# --------------------------------------------------------------------------
# video sources
# --------------------------------------------------------------------------

def make_synthetic_video(num_frames: int, h: int, w: int, n_init: int,
                         n_new: int, arrive: int, seed: int = 0,
                         normalize: bool = True):
    """Deterministic multi-object clip.

    Returns (imgs [T,H,W,3] float32 normalized, label0 [H,W] uint8 ids
    1..n_init, new_label [H,W] uint8 with ONLY ids n_init+1..n_init+n_new
    marked at frame `arrive` — the YTB-style arrival annotation).
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n_total = n_init + n_new

    # per-object appearance + motion
    colors = rng.rand(n_total, 3) * 0.8 + 0.2
    radii = rng.uniform(0.09, 0.16, n_total) * min(h, w)
    cx0 = rng.uniform(0.25, 0.75, n_total) * w
    cy0 = rng.uniform(0.25, 0.75, n_total) * h
    vel = rng.uniform(-1.2, 1.2, (n_total, 2)) * min(h, w) / 100.0
    ecc = rng.uniform(0.7, 1.4, n_total)

    # textured drifting background
    fx, fy = rng.uniform(2, 5, 2)
    imgs = np.empty((num_frames, h, w, 3), np.float32)
    labels = np.zeros((num_frames, h, w), np.uint8)
    for t in range(num_frames):
        bg = 0.35 + 0.15 * np.sin(2 * np.pi * (fx * xx / w + 0.01 * t)) \
            * np.cos(2 * np.pi * (fy * yy / h - 0.02 * t))
        frame = np.stack([bg * c for c in (1.0, 0.9, 1.1)], axis=-1)
        lab = np.zeros((h, w), np.uint8)
        for o in range(n_total):
            if o >= n_init and t < arrive:
                continue
            cx = cx0[o] + vel[o, 0] * t
            cy = cy0[o] + vel[o, 1] * t
            # bounce off borders
            cx = abs(cx) if cx > 0 else -cx
            cx = w - abs(w - cx % (2 * w)) if cx > w else cx
            cy = h - abs(h - cy % (2 * h)) if cy > h else cy
            d = ((xx - cx) / ecc[o]) ** 2 + ((yy - cy) * ecc[o]) ** 2
            inside = d < radii[o] ** 2
            frame[inside] = colors[o] * (0.8 + 0.2 * np.cos(0.2 * t + o))
            lab[inside] = o + 1  # later objects occlude earlier ones
        imgs[t] = frame
        labels[t] = lab

    label0 = labels[0].copy()
    label0[label0 > n_init] = 0
    new_label = labels[arrive].copy()
    new_label[new_label <= n_init] = 0
    imgs = np.clip(imgs, 0, 1)
    if normalize:
        imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD
    else:
        imgs = imgs * 255.0  # raw frames (TTA path normalises per variant)
    return imgs.astype(np.float32), label0, new_label


def load_demo_video(h: int, w: int, max_frames: int, seq: str | None = None):
    """Real frames from the mounted Demo dataset, resized to (h, w)."""
    import cv2
    from PIL import Image

    img_root = os.path.join(REF, "datasets/Demo/images")
    seqs = sorted(os.listdir(img_root))
    seq = seq or seqs[0]
    idir = os.path.join(img_root, seq)
    mdir = os.path.join(REF, "datasets/Demo/masks", seq)
    frames = sorted(os.listdir(idir))[:max_frames]
    imgs = np.empty((len(frames), h, w, 3), np.float32)
    for t, f in enumerate(frames):
        bgr = cv2.imread(os.path.join(idir, f))
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        imgs[t] = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_LINEAR)
    mask_file = sorted(os.listdir(mdir))[0]
    m = np.array(Image.open(os.path.join(mdir, mask_file)))
    label0 = cv2.resize(m.astype(np.uint8), (w, h),
                        interpolation=cv2.INTER_NEAREST)
    imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD
    return imgs.astype(np.float32), label0, None


# --------------------------------------------------------------------------
# reference side (torch, CPU)
# --------------------------------------------------------------------------

def build_reference(model_name: str):
    import torch  # noqa: F401

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import networks.layers.attention as ref_att
    from tests.test_torch_parity import _fixed_v3_forward

    ref_att.MultiheadLocalAttentionV3.forward = _fixed_v3_forward
    from configs.default import DefaultEngineConfig
    import networks.models as ref_models

    cfg = DefaultEngineConfig("equiv", model_name)
    model = ref_models.build_vos_model(cfg.MODEL_VOS, cfg).eval()
    return cfg, model


def run_reference(ref_cfg, ref_model, imgs, label0, new_label, arrive,
                  lt_gap, st_skip, max_aot_obj_num=None):
    """The reference evaluator's single-aug frame loop
    (networks/managers/evaluator.py:315-422), on pre-sized tensors."""
    import torch
    from networks.engines import build_engine

    T, H, W, _ = imgs.shape
    eng = build_engine(ref_cfg.MODEL_ENGINE, phase="eval",
                       aot_model=ref_model, gpu_id=0,
                       long_term_mem_gap=lt_gap,
                       short_term_mem_skip=st_skip,
                       **({} if max_aot_obj_num is None
                          else {"max_aot_obj_num": max_aot_obj_num}))
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous()
    lab0 = torch.from_numpy(label0.astype(np.float32))[None, None]
    preds, logits_out = [label0.astype(np.int32)], [None]
    with torch.no_grad():
        eng.add_reference_frame(timgs[0:1], lab0, frame_step=0,
                                obj_nums=int(label0.max()))
        for t in range(1, T):
            eng.match_propogate_one_frame(timgs[t:t + 1])
            logit = eng.decode_current_logits((H, W))
            prob = torch.softmax(logit, dim=1)
            label = torch.argmax(prob, dim=1, keepdim=True).float()
            if new_label is not None and t == arrive:
                new = torch.from_numpy(
                    new_label.astype(np.float32))[None, None]
                keep = (new == 0).float()
                label = label * keep + new * (1 - keep)
                eng.add_reference_frame(timgs[t:t + 1], label,
                                        obj_nums=int(label.max().item()),
                                        frame_step=t)
                eng.decode_current_logits((H, W))
                eng.update_memory(label)
            else:
                eng.update_memory(label)
            preds.append(label[0, 0].numpy().astype(np.int32))
            logits_out.append(logit[0].numpy())
    return preds, logits_out


# --------------------------------------------------------------------------
# my side (jax)
# --------------------------------------------------------------------------

def build_mine(model_name: str, lt_gap, st_skip, ref_model):
    import jax
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.models import build_vos_model
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.utils.torch_import import convert_state_dict

    cfg = build_config(stage="ytb", model=model_name)
    cfg.TEST_LONG_TERM_MEM_GAP = lt_gap
    cfg.TEST_SHORT_TERM_MEM_SKIP = st_skip
    if DTYPE_OVERRIDE:  # bf16-vs-fp32-reference agreement runs
        cfg.TEST_DTYPE = DTYPE_OVERRIDE
    if ATTN_IMPL_OVERRIDE:
        cfg.ATTN_IMPL = ATTN_IMPL_OVERRIDE
    model = build_vos_model(cfg, eval_mode=True)
    eng = build_infer_engine(model, cfg)

    H = W = 65 if cfg.MODEL_ALIGN_CORNERS else 64
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    onehot = jnp.zeros((1, H, W, cfg.MODEL_MAX_OBJ_NUM + 1), jnp.float32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), img, onehot)
    params, missing, unused = convert_state_dict(
        ref_model.state_dict(), variables["params"], cfg)
    real_missing = [m for m in missing if "running" not in m]
    assert not real_missing, f"unconverted: {real_missing[:8]}"
    return cfg, eng, params


def run_mine(eng, params, imgs, label0, new_label, arrive):
    """Mirror of run_reference on VOSInferEngine primitives."""
    import jax
    import jax.numpy as jnp

    T, H, W, _ = imgs.shape
    jimgs = jnp.asarray(imgs)
    preds, logits_out = [label0.astype(np.int32)], [None]

    add = jax.jit(eng.add_reference_frame,
                  static_argnames=("obj_num", "frame_step"))
    prop = jax.jit(eng.propagate)
    dec = jax.jit(eng.decode_logits, static_argnames=("output_size",))
    upd = jax.jit(eng.update_memory)

    state = add(params, jimgs[0:1],
                jnp.asarray(label0.astype(np.int32))[None],
                obj_num=int(label0.max()))
    # host mirror of the LT schedule drives just-in-time capacity growth
    # ('grow' policy = the reference's unbounded memory)
    shadow = eng.make_shadow()
    shadow.add_ref(0)
    for t in range(1, T):
        state = prop(params, state, jimgs[t:t + 1])
        logits = dec(params, state, output_size=(H, W))
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if new_label is not None and t == arrive:
            new = jnp.asarray(new_label.astype(np.int32))[None]
            merged = jnp.where(new > 0, new, pred)
            new_obj_num = int(jnp.max(merged))
            state = eng.ensure_lt_capacity(state, shadow.count + 1)
            state = add(params, jimgs[t:t + 1], merged,
                        obj_num=new_obj_num, state=state, frame_step=t)
            shadow.add_ref(t)
            state = upd(params, state, merged)
            shadow.update(t)
            pred = merged
        else:
            if shadow.will_write(t):
                state = eng.ensure_lt_capacity(state, shadow.count + 1)
            state = upd(params, state, pred)
            shadow.update(t)
        preds.append(np.asarray(pred[0]).astype(np.int32))
        logits_out.append(np.asarray(logits[0]).transpose(2, 0, 1))
    return preds, logits_out


# --------------------------------------------------------------------------
# MODEL_USE_PREV_PROB: soft-prob memory writes
# --------------------------------------------------------------------------
# The reference's own prev-prob plumbing is unrunnable as written: the
# evaluator branch reads an undefined `current_prob` when TEST_FLIP is off
# (evaluator.py:438-441, the intended line survives only as a comment at
# :433-434), and a (1, C, H, W) prob passed to update_short_term_memory is
# misclassified as a label by the `size()[0] == 1` guard (aot_engine.py:309)
# and fed through one_hot_mask. The INTENDED semantics — id embedding
# computed from the soft probability map instead of the hard one-hot — is
# what both sides run here: the reference via
# assign_identity(prob) + update_short_term_memory(None, curr_id_emb=...),
# mine via update_memory(prob=...).

def run_reference_prevprob(ref_cfg, ref_model, imgs, label0, lt_gap,
                           st_skip):
    import torch
    from networks.engines import build_engine

    T, H, W, _ = imgs.shape
    eng = build_engine(ref_cfg.MODEL_ENGINE, phase="eval",
                       aot_model=ref_model, gpu_id=0,
                       long_term_mem_gap=lt_gap,
                       short_term_mem_skip=st_skip)
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous()
    lab0 = torch.from_numpy(label0.astype(np.float32))[None, None]
    preds, logits_out = [label0.astype(np.int32)], [None]
    with torch.no_grad():
        eng.add_reference_frame(timgs[0:1], lab0, frame_step=0,
                                obj_nums=int(label0.max()))
        sub = eng.aot_engines[0]
        for t in range(1, T):
            eng.match_propogate_one_frame(timgs[t:t + 1])
            logit = eng.decode_current_logits((H, W))
            prob = torch.softmax(logit, dim=1)
            label = torch.argmax(prob, dim=1, keepdim=True).float()
            id_emb = sub.assign_identity(prob)
            sub.update_short_term_memory(None, curr_id_emb=id_emb)
            preds.append(label[0, 0].numpy().astype(np.int32))
            logits_out.append(logit[0].numpy())
    return preds, logits_out


def run_mine_prevprob(eng, params, imgs, label0):
    import jax
    import jax.numpy as jnp

    T, H, W, _ = imgs.shape
    jimgs = jnp.asarray(imgs)
    preds, logits_out = [label0.astype(np.int32)], [None]

    add = jax.jit(eng.add_reference_frame,
                  static_argnames=("obj_num", "frame_step"))
    prop = jax.jit(eng.propagate)
    dec = jax.jit(eng.decode_logits, static_argnames=("output_size",))
    upd_prob = jax.jit(
        lambda p, s, pr: eng.engine.update_memory(p, s, prob=pr))

    state = add(params, jimgs[0:1],
                jnp.asarray(label0.astype(np.int32))[None],
                obj_num=int(label0.max()))
    shadow = eng.make_shadow()
    shadow.add_ref(0)
    for t in range(1, T):
        state = prop(params, state, jimgs[t:t + 1])
        logits = dec(params, state, output_size=(H, W))
        prob = jax.nn.softmax(logits, axis=-1)
        pred = jnp.argmax(prob, axis=-1).astype(jnp.int32)
        if shadow.will_write(t):
            state = eng.ensure_lt_capacity(state, shadow.count + 1)
        state = upd_prob(params, state, prob)
        shadow.update(t)
        preds.append(np.asarray(pred[0]).astype(np.int32))
        logits_out.append(np.asarray(logits[0]).transpose(2, 0, 1))
    return preds, logits_out


def run_clip_prevprob(model_name, imgs, label0, lt_gap, st_skip):
    ref_cfg, ref_model = build_reference(model_name)
    my_cfg, eng, params = build_mine(model_name, lt_gap, st_skip, ref_model)
    ref_preds, ref_logits = run_reference_prevprob(
        ref_cfg, ref_model, imgs, label0, lt_gap, st_skip)
    my_preds, my_logits = run_mine_prevprob(eng, params, imgs, label0)
    return compare(ref_preds, my_preds, ref_logits, my_logits,
                   int(label0.max()))


# --------------------------------------------------------------------------
# .pth export round-trip: the REFERENCE engine running TPU-exported weights
# --------------------------------------------------------------------------

def run_clip_export_roundtrip(model_name, imgs, label0, new_label, arrive,
                              lt_gap, st_skip, tmpdir):
    """Closes the checkpoint-parity loop (reference utils/checkpoint.py:
    124-160 format): THIS framework's natively-initialised params are
    exported with utils/torch_import.export_state_dict, loaded into the
    reference model through its own load_network, and the two engines are
    compared — i.e. the reference itself validates a TPU-side checkpoint."""
    import jax
    import jax.numpy as jnp
    import torch
    from functools import partial as _partial

    from aot_tpu.configs import build_config
    from aot_tpu.engine import build_infer_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.torch_import import save_torch_checkpoint

    cfg = build_config(stage="ytb", model=model_name)
    cfg.TEST_LONG_TERM_MEM_GAP = lt_gap
    cfg.TEST_SHORT_TERM_MEM_SKIP = st_skip
    model = build_vos_model(cfg, eval_mode=True)
    eng = build_infer_engine(model, cfg)
    Hc = Wc = 65 if cfg.MODEL_ALIGN_CORNERS else 64
    params = jax.jit(_partial(model.init, deterministic=True))(
        jax.random.PRNGKey(7), jnp.zeros((1, Hc, Wc, 3)),
        jnp.zeros((1, Hc, Wc, cfg.MODEL_MAX_OBJ_NUM + 1)))["params"]

    ckpt = os.path.join(tmpdir, "save_step_1000.pth")
    unmapped = save_torch_checkpoint(ckpt, params, cfg)
    assert not unmapped, f"unexported params: {unmapped[:8]}"

    ref_cfg, ref_model = build_reference(model_name)
    from utils.checkpoint import load_network

    ref_model, removed = load_network(ref_model, ckpt, None)
    allowed = ("num_batches_tracked", "relative_position_index",
               "attn_mask", "mask_token")
    bad = [k for k in removed if not any(a in k for a in allowed)]
    assert not bad, f"reference load_network dropped: {bad[:8]}"
    ref_model = ref_model.eval()

    ref_preds, ref_logits = run_reference(
        ref_cfg, ref_model, imgs, label0, new_label, arrive, lt_gap, st_skip)
    my_preds, my_logits = run_mine(eng, params, imgs, label0, new_label,
                                   arrive)
    obj_num = int(max(label0.max(),
                      0 if new_label is None else new_label.max()))
    return compare(ref_preds, my_preds, ref_logits, my_logits, obj_num)


# --------------------------------------------------------------------------
# TTA (multi-scale + flip): reference evaluator loop vs my real Evaluator
# --------------------------------------------------------------------------

def run_reference_tta(ref_cfg, ref_model, imgs_raw, label0, new_label,
                      arrive, lt_gap, st_skip, scales, flip):
    """The reference evaluator's multi-aug loop (evaluator.py:270-446):
    one engine per (scale x flip) variant, probs averaged at original size,
    per-variant labels written back into each engine's memory."""
    import torch
    import torch.nn.functional as F
    from networks.engines import build_engine

    from aot_tpu.data.video_aug import multi_restrict_size

    T, H, W, _ = imgs_raw.shape
    align = ref_cfg.MODEL_ALIGN_CORNERS

    def variants_for(frame):
        return multi_restrict_size(frame, None, multi_scale=scales,
                                   flip=flip, max_short_edge=None,
                                   max_long_edge=800 * 1.3,
                                   align_corners=align)

    v0 = variants_for(imgs_raw[0])
    n_var = len(v0)
    engines = [build_engine(ref_cfg.MODEL_ENGINE, phase="eval",
                            aot_model=ref_model, gpu_id=0,
                            long_term_mem_gap=lt_gap,
                            short_term_mem_skip=st_skip)
               for _ in range(n_var)]

    def to_t(img_hwc):
        return torch.from_numpy(
            img_hwc.transpose(2, 0, 1).copy())[None].float()

    def lab_to_input(label_orig_t, flipped, size2d):
        lab = torch.flip(label_orig_t, (3,)) if flipped else label_orig_t
        return F.interpolate(lab, size=size2d, mode="nearest")

    lab0 = torch.from_numpy(label0.astype(np.float32))[None, None]
    preds = [label0.astype(np.int32)]
    with torch.no_grad():
        for vi, v in enumerate(v0):
            img = to_t(v["image"])
            lab = lab_to_input(lab0, v["flip"], img.shape[2:])
            engines[vi].add_reference_frame(img, lab, frame_step=0,
                                            obj_nums=int(label0.max()))
        for t in range(1, T):
            vs = variants_for(imgs_raw[t])
            all_probs = []
            for vi, v in enumerate(vs):
                engines[vi].match_propogate_one_frame(to_t(v["image"]))
                logit = engines[vi].decode_current_logits((H, W))
                if v["flip"]:
                    logit = torch.flip(logit, (3,))
                all_probs.append(torch.softmax(logit, dim=1))
            pred_prob = torch.mean(torch.cat(all_probs, dim=0), dim=0,
                                   keepdim=True)
            pred_label = torch.argmax(pred_prob, dim=1, keepdim=True).float()
            var_labels = [torch.argmax(p, dim=1, keepdim=True).float()
                          for p in all_probs]
            if new_label is not None and t == arrive:
                new = torch.from_numpy(
                    new_label.astype(np.float32))[None, None]
                keep = (new == 0).float()
                pred_label = pred_label * keep + new * (1 - keep)
                var_labels = [l * keep + new * (1 - keep)
                              for l in var_labels]
                new_obj = int(pred_label.max().item())
                for vi, v in enumerate(vs):
                    img = to_t(v["image"])
                    lab = lab_to_input(var_labels[vi], v["flip"],
                                       img.shape[2:])
                    engines[vi].add_reference_frame(
                        img, lab, obj_nums=new_obj, frame_step=t)
                    engines[vi].decode_current_logits((H, W))
                    engines[vi].update_memory(lab)
            else:
                for vi, v in enumerate(vs):
                    size2d = engines[vi].input_size_2d
                    lab = lab_to_input(var_labels[vi], v["flip"], size2d)
                    engines[vi].update_memory(lab)
            preds.append(pred_label[0, 0].numpy().astype(np.int32))
    return preds


class ArraySequence:
    """In-memory eval sequence for the real Evaluator (raw [0,255] frames;
    labels only at frame 0 and the arrival frame, YTB-style)."""

    def __init__(self, imgs_raw, label0, new_label=None, arrive=-1):
        self.seq_name = "equiv"
        self.imgs = imgs_raw
        self.label0 = label0
        self.new_label = new_label
        self.arrive = arrive

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        h, w = self.imgs.shape[1:3]
        label = None
        if idx == 0:
            label = self.label0
        elif self.new_label is not None and idx == self.arrive:
            label = self.new_label
        n_obj = int(max(self.label0.max(),
                        0 if self.new_label is None
                        else self.new_label.max()))
        return {
            "image": self.imgs[idx],
            "label": label,
            "meta": {
                "seq_name": self.seq_name,
                "frame_num": len(self.imgs),
                "obj_num": int(self.label0.max()) if idx == 0 else n_obj,
                "current_name": f"{idx:05d}.jpg",
                "height": h, "width": w,
                "obj_idx": list(range(n_obj + 1)),
            },
        }


def run_mine_evaluator(model_name, ref_model, imgs_raw, label0, new_label,
                       arrive, lt_gap, st_skip, scales, flip, outdir):
    """Drive the ACTUAL Evaluator (aot_tpu/eval/evaluator.py) and read back
    the PNG masks it writes."""
    from PIL import Image

    from aot_tpu.configs import build_config
    from aot_tpu.eval.evaluator import Evaluator
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.torch_import import convert_state_dict
    import jax
    import jax.numpy as jnp

    cfg = build_config(stage="ytb", model=model_name)
    cfg.TEST_LONG_TERM_MEM_GAP = lt_gap
    cfg.TEST_SHORT_TERM_MEM_SKIP = st_skip
    if DTYPE_OVERRIDE:
        cfg.TEST_DTYPE = DTYPE_OVERRIDE
    if ATTN_IMPL_OVERRIDE:
        cfg.ATTN_IMPL = ATTN_IMPL_OVERRIDE
    cfg.TEST_MULTISCALE = list(scales)
    cfg.TEST_FLIP = flip
    model = build_vos_model(cfg, eval_mode=True)
    Hc = Wc = 65 if cfg.MODEL_ALIGN_CORNERS else 64
    variables = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, Hc, Wc, 3)),
        jnp.zeros((1, Hc, Wc, cfg.MODEL_MAX_OBJ_NUM + 1)))
    params, missing, _ = convert_state_dict(
        ref_model.state_dict(), variables["params"], cfg)
    assert not [m for m in missing if "running" not in m]

    ev = Evaluator(cfg, model, params, result_root=outdir)
    seq = ArraySequence(imgs_raw, label0, new_label, arrive)
    ev.eval_sequence(seq)

    preds = [label0.astype(np.int32)]
    for t in range(1, len(imgs_raw)):
        p = os.path.join(outdir, seq.seq_name, f"{t:05d}.png")
        preds.append(np.array(Image.open(p)).astype(np.int32))
    return preds


def run_clip_tta(model_name, imgs, label0, new_label, arrive, lt_gap,
                 st_skip, scales, flip, outdir):
    """TTA equivalence on RAW [0,255] frames (both sides share
    multi_restrict_size for variant construction)."""
    ref_cfg, ref_model = build_reference(model_name)
    ref_preds = run_reference_tta(ref_cfg, ref_model, imgs, label0,
                                  new_label, arrive, lt_gap, st_skip,
                                  scales, flip)
    my_preds = run_mine_evaluator(model_name, ref_model, imgs, label0,
                                  new_label, arrive, lt_gap, st_skip,
                                  scales, flip, outdir)
    return compare(ref_preds, my_preds,
                   [None] * len(ref_preds), [None] * len(my_preds), 0)


# --------------------------------------------------------------------------
# comparison
# --------------------------------------------------------------------------

class FrameReport(list):
    """Per-frame agreement entries, plus `.jf`: the J&F of this framework's
    masks scored against the reference's masks as pseudo-ground-truth —
    the VERDICT's 'north-star unit' for the equivalence chain (the official
    scoring the masks feed, reference utils/eval.py:5-13, README.md:142).
    A J&F of ~1.0 here bounds the J&F delta attributable to the framework."""

    jf = None


def compare(ref_preds, my_preds, ref_logits, my_logits, obj_num):
    per_frame = FrameReport()
    for t, (a, b) in enumerate(zip(ref_preds, my_preds)):
        agree = float((a == b).mean())
        entry = {"frame": t, "agree": agree}
        if ref_logits[t] is not None and my_logits[t] is not None:
            live = slice(0, obj_num + 1)
            d = np.abs(ref_logits[t][live] - my_logits[t][live])
            entry["logit_max_abs_diff"] = float(d.max())
        per_frame.append(entry)
    from aot_tpu.eval.metrics import evaluate_sequence

    mine = [np.asarray(p) for p in my_preds]
    ref = [np.asarray(r) for r in ref_preds]
    per_frame.jf = evaluate_sequence(mine, ref)
    # Size-binned view: the Demo mask is panoptic-style (44 ids at 1080p,
    # some <100 px, i.e. sub-pixel after the test resize); per-object J&F
    # averages give a 1-pixel object the same weight as a 500k-pixel one,
    # so a single boundary flip on a tiny object dominates the mean. The
    # >=64px bin is the signal for real-object tracking quality; the full
    # mean above stays the headline for honesty.
    areas = {}
    for r in ref:
        ids, counts = np.unique(r, return_counts=True)
        for i, c in zip(ids.tolist(), counts.tolist()):
            if i != 0:
                areas[i] = max(areas.get(i, 0), c)
    big = sorted(i for i, a in areas.items() if a >= 64)
    if big and len(big) < len(areas):
        per_frame.jf["jf_objects_ge64px"] = evaluate_sequence(
            mine, ref, object_ids=big)["J&F"]
        per_frame.jf["n_objects_ge64px"] = len(big)
    return per_frame


def run_clip(model_name, imgs, label0, new_label, arrive, lt_gap, st_skip,
             max_aot_obj_num=None):
    ref_cfg, ref_model = build_reference(model_name)
    my_cfg, eng, params = build_mine(model_name, lt_gap, st_skip, ref_model)
    if max_aot_obj_num is not None:
        # grouping width only — the per-group one-hot/id-bank width stays at
        # the model's max_obj_num, as in the reference (aot_engine.py:496-500)
        eng.max_obj_num = min(max_aot_obj_num, eng.max_obj_num)
    ref_preds, ref_logits = run_reference(
        ref_cfg, ref_model, imgs, label0, new_label, arrive, lt_gap, st_skip,
        max_aot_obj_num)
    my_preds, my_logits = run_mine(eng, params, imgs, label0, new_label,
                                   arrive)
    obj_num = int(max(label0.max(),
                      0 if new_label is None else new_label.max()))
    return compare(ref_preds, my_preds, ref_logits, my_logits, obj_num)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="aott")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", type=int, nargs=2, default=None,
                    metavar=("H", "W"))
    ap.add_argument("--objs", type=int, default=2)
    ap.add_argument("--new-objs", type=int, default=1)
    ap.add_argument("--arrive", type=int, default=10)
    ap.add_argument("--lt-gap", type=int, default=5)
    ap.add_argument("--st-skip", type=int, default=1)
    ap.add_argument("--max-aot-obj-num", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-agree", type=float, default=0.999)
    ap.add_argument("--demo", action="store_true",
                    help="also run the mounted real Demo clip")
    ap.add_argument("--tta", action="store_true",
                    help="multi-scale + flip TTA equivalence (drives the "
                         "real Evaluator vs the reference's multi-aug loop)")
    ap.add_argument("--prevprob", action="store_true",
                    help="MODEL_USE_PREV_PROB: soft-prob memory writes "
                         "(intended semantics of evaluator.py:428-446)")
    ap.add_argument("--export-roundtrip", action="store_true",
                    help="reference engine runs THIS framework's exported "
                         ".pth checkpoint (closes checkpoint-format parity)")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--dtype", default=None,
                    help="TEST_DTYPE for THIS framework's engine (e.g. "
                         "bfloat16); the torch reference stays fp32")
    ap.add_argument("--attn_impl", default=None,
                    help="ATTN_IMPL for THIS framework ('window' = the TPU "
                         "serving dispatch, forced on CPU)")
    args = ap.parse_args()
    if args.dtype:
        global DTYPE_OVERRIDE
        DTYPE_OVERRIDE = args.dtype
    if args.attn_impl:
        global ATTN_IMPL_OVERRIDE
        ATTN_IMPL_OVERRIDE = args.attn_impl

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.size is None:
        from aot_tpu.configs import build_config
        ac = build_config(stage="ytb", model=args.model).MODEL_ALIGN_CORNERS
        args.size = (129, 129) if ac else (128, 128)
    h, w = args.size

    report = {"model": args.model, "clips": {}}
    if args.prevprob:
        imgs, lab0, _ = make_synthetic_video(
            args.frames, h, w, args.objs, 0, -1, args.seed)
        report["clips"]["prevprob"] = run_clip_prevprob(
            args.model, imgs, lab0, args.lt_gap, args.st_skip)
    elif args.export_roundtrip:
        import tempfile

        imgs, lab0, new = make_synthetic_video(
            args.frames, h, w, args.objs, args.new_objs, args.arrive,
            args.seed)
        with tempfile.TemporaryDirectory() as td:
            report["clips"]["export_roundtrip"] = run_clip_export_roundtrip(
                args.model, imgs, lab0, new, args.arrive, args.lt_gap,
                args.st_skip, td)
    elif args.tta:
        import tempfile

        imgs, lab0, new = make_synthetic_video(
            args.frames, h, w, args.objs, args.new_objs, args.arrive,
            args.seed, normalize=False)
        with tempfile.TemporaryDirectory() as td:
            report["clips"]["tta"] = run_clip_tta(
                args.model, imgs, lab0, new, args.arrive, args.lt_gap,
                args.st_skip, scales=[1.0, 1.3], flip=True, outdir=td)
    else:
        imgs, lab0, new = make_synthetic_video(
            args.frames, h, w, args.objs, args.new_objs, args.arrive,
            args.seed)
        report["clips"]["synthetic"] = run_clip(
            args.model, imgs, lab0, new, args.arrive, args.lt_gap,
            args.st_skip, args.max_aot_obj_num)
    if args.demo:
        imgs, lab0, _ = load_demo_video(h, w, args.frames)
        report["clips"]["demo"] = run_clip(
            args.model, imgs, lab0, None, -1, args.lt_gap, args.st_skip,
            args.max_aot_obj_num)

    # artifact schema: per clip {"frames": [...], "jf_vs_ref": {...}} — the
    # J&F scores this framework's masks against the reference's as
    # pseudo-ground-truth (the north-star unit; see FrameReport)
    report["dtype"] = DTYPE_OVERRIDE or "float32"
    report["attn_impl"] = ATTN_IMPL_OVERRIDE or "auto"
    report["clips"] = {
        name: {"frames": list(pf),
               **({"jf_vs_ref": pf.jf}
                  if getattr(pf, "jf", None) else {})}
        for name, pf in report["clips"].items()}
    worst = min(f["agree"] for clip in report["clips"].values()
                for f in clip["frames"])
    report["worst_frame_agreement"] = worst
    report["pass"] = bool(worst >= args.min_agree)
    print(json.dumps(report))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(report, fh, indent=1)
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
