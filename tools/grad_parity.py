"""Gradient parity: torch reference vs this framework on the same batch.

Forward-loss parity is already tested (tests/test_train_parity.py); this
compares the BACKWARD pass — per-module gradient norms from the same
converted weights, same clip, both sides deterministic — to localise any
training-dynamics divergence (losses can match while gradients do not).

Usage: python tools/grad_parity.py [--batch_npz /tmp/ab_batch.npz]
Prints one line per top-level module: torch-norm, jax-norm, ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REF)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_npz", default="")
    ap.add_argument("--model", default="aott")
    ap.add_argument("--step", type=int, default=100)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.manual_seed(0)
    from tests.test_torch_parity import _fixed_v3_forward
    import networks.layers.attention as ref_att

    ref_att.MultiheadLocalAttentionV3.forward = _fixed_v3_forward

    from configs.default import DefaultEngineConfig
    import networks.models as ref_models
    from networks.engines import build_engine as ref_build_engine

    ref_cfg = DefaultEngineConfig("grad_parity", args.model)
    ref_cfg.TRAIN_LSTT_DROPPATH = 0.0
    ref_model = ref_models.build_vos_model(ref_cfg.MODEL_VOS, ref_cfg)
    ref_engine = ref_build_engine(
        ref_cfg.MODEL_ENGINE, "train", aot_model=ref_model, gpu_id=-1,
        long_term_mem_gap=ref_cfg.TRAIN_LONG_TERM_MEM_GAP)
    ref_engine.eval()  # deterministic; losses still computed

    if args.batch_npz:
        d = np.load(args.batch_npz)
        frames_u8, labels = d["frames"], d["labels"]
        obj_nums = [int(x) for x in d["obj_nums"]]
        t_len, bsz, h, w, _ = frames_u8.shape
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        frames = ((frames_u8.astype(np.float32) / 255.0 - mean) / std)
    else:
        rng = np.random.RandomState(0)
        t_len, bsz, h, w = 5, 2, 65, 65
        frames = rng.rand(t_len, bsz, h, w, 3).astype(np.float32)
        labels = np.zeros((t_len, bsz, h, w), np.int64)
        for t in range(t_len):
            o = 8 + 2 * t
            labels[t, :, o:o + 20, o:o + 20] = 1
            labels[t, :, 40:58, 35:60] = 2
        obj_nums = [2, 2]

    tf = torch.from_numpy(
        frames.reshape(t_len * bsz, h, w, 3).transpose(0, 3, 1, 2).copy())
    tm = torch.from_numpy(
        labels.astype(np.int64).reshape(t_len * bsz, 1, h, w).copy())

    ref_engine.restart_engine(bsz, False)
    loss, _, _, _ = ref_engine(
        tf, tm.float(), bsz, obj_nums, step=args.step, use_prev_pred=False)
    loss = torch.mean(loss)
    loss.backward()

    def bucket(name):
        parts = name.split(".")
        if parts[0] == "encoder":
            return "encoder"
        if parts[0] == "LSTT":
            if parts[1] == "decoder_norms":
                return "lstt.final_norm"
            # LSTT.layers.0.<sub>...
            return "lstt." + (parts[3] if len(parts) > 3 else parts[-1])
        return parts[0]

    t_norms = defaultdict(float)
    for name, p in ref_model.named_parameters():
        if p.grad is not None:
            t_norms[bucket(name)] += float((p.grad.detach() ** 2).sum())

    # ---- jax side ----
    import jax
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.engine.train import build_train_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.utils.torch_import import convert_state_dict

    my_cfg = build_config(stage="ytb", model=args.model,
                          TRAIN_DTYPE="float32", TRAIN_LSTT_DROPPATH=0.0)
    my_model = build_vos_model(my_cfg)
    img0 = jnp.zeros((1, h, w, 3))
    oh0 = jnp.zeros((1, h, w, 11)).at[..., 0].set(1.0)
    variables = jax.jit(partial(my_model.init, deterministic=True))(
        jax.random.PRNGKey(0), img0, oh0)
    params, missing, _ = convert_state_dict(
        ref_model.state_dict(), variables["params"], my_cfg)

    eng = build_train_engine(my_model, my_cfg)

    def loss_fn(p):
        l, _ = eng.forward(
            p, jnp.asarray(frames), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(obj_nums, jnp.int32), float(args.step),
            deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "droppath": jax.random.PRNGKey(2)})
        return l

    my_loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)

    # flax-side module names -> the torch reference's (for aligned rows)
    _ALIAS = {"ffn_linear1": "linear1", "ffn_linear2": "linear2",
              "ffn_act": "activation", "LayerNorm_0": "final_norm"}

    def jbucket(path):
        parts = path.split("/")
        if parts[0] == "encoder":
            return "encoder"
        if parts[0] == "lstt":
            if parts[1].startswith(("LayerNorm_", "decoder_norm")):
                return "lstt.final_norm"
            sub = parts[2] if len(parts) > 2 else parts[-1]
            return "lstt." + _ALIAS.get(sub, sub)
        return parts[0]

    # Mask frozen leaves before measuring: the torch side's frozen params
    # (requires_grad=False — encoder stem/stage1 at FREEZE_AT=2, FrozenBN
    # affine) never materialise a .grad, while jax differentiates the whole
    # tree and masks in the optimizer (train/optim.py leaf_update). Without
    # this the encoder bucket compares torch's trainable subset against
    # jax's full tree — a spurious ~10x.
    from aot_tpu.train.optim import build_param_groups
    frozen = build_param_groups(my_cfg, params)["frozen"]
    grads = jax.tree.map(
        lambda g, f: jnp.zeros_like(g) if f else g, grads, frozen)

    j_norms = defaultdict(float)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        j_norms[jbucket(p)] += float(jnp.sum(leaf.astype(jnp.float32) ** 2))

    print(json.dumps({"torch_loss": round(float(loss.detach()), 6),
                      "jax_loss": round(float(my_loss), 6)}), flush=True)
    keys = sorted(set(t_norms) | set(j_norms))
    for k in keys:
        tn = t_norms.get(k, 0.0) ** 0.5
        jn = j_norms.get(k, 0.0) ** 0.5
        ratio = jn / tn if tn > 0 else float("inf")
        print(json.dumps({"module": k, "torch": round(tn, 5),
                          "jax": round(jn, 5),
                          "ratio": round(ratio, 4)}), flush=True)


if __name__ == "__main__":
    main()
