"""Checkpoint IO.

Native format: flax msgpack files named save_step_{N}.msgpack holding the
serialized TrainState (params / opt_state / ema / step), with keep-last-N
garbage collection and a backup-dir fallback (reference:
utils/checkpoint.py:124-160). Loading is partial and prefix-tolerant
(reference: :94-121). PyTorch .pth import lives in torch_import.py.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _step_of(path: str) -> int:
    m = re.search(r"save_step_(\d+)", path)
    return int(m.group(1)) if m else -1


def list_checkpoints(ckpt_dir: str) -> List[str]:
    paths = glob.glob(os.path.join(ckpt_dir, "save_step_*.msgpack"))
    return sorted(paths, key=_step_of)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    paths = list_checkpoints(ckpt_dir)
    return paths[-1] if paths else None


def save_pytree(tree: Any, path: str) -> None:
    data = serialization.to_bytes(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_checkpoint(ckpt_dir: str, step: int, tree: Any,
                    max_keep: int = 8,
                    backup_dir: Optional[str] = None) -> str:
    """Write save_step_{N}; GC old ones; fall back to backup_dir on error
    (reference: utils/checkpoint.py:124-160)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"save_step_{step}.msgpack")
    try:
        save_pytree(tree, path)
    except OSError:
        if backup_dir is None:
            raise
        os.makedirs(backup_dir, exist_ok=True)
        path = os.path.join(backup_dir, f"save_step_{step}.msgpack")
        save_pytree(tree, path)
    for old in list_checkpoints(os.path.dirname(path))[:-max_keep]:
        try:
            os.remove(old)
        except OSError:
            pass
    return path


def resolve_checkpoint(ckpt_dir: str, path: Optional[str] = None,
                       step: Optional[int] = None) -> Optional[str]:
    """Explicit path > explicit step > latest (reference: evaluator.py:52-98)."""
    if path is not None:
        return path
    if step is not None:
        return os.path.join(ckpt_dir, f"save_step_{step}.msgpack")
    return latest_checkpoint(ckpt_dir)


def load_params_partial(path: str, target_params: Any,
                        verbose: bool = True) -> Tuple[Any, List[str]]:
    """Prefix-tolerant partial parameter load: keys present in the file and
    matching in shape are taken; everything else keeps the target's value.
    Returns (params, list of keys that could not be loaded)
    (reference: utils/checkpoint.py:94-121 load_network)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    # accept either a bare params dict or a full TrainState dump
    src = raw.get("params", raw) if isinstance(raw, dict) else raw

    def flatten(tree):
        out = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in kp)
            out[key] = leaf
        return out

    src_flat = flatten(src)
    if isinstance(raw, dict) and raw.get("batch_stats"):
        # trainable-BN (MODEL_FREEZE_BN=False) checkpoints carry running
        # stats in a separate batch_stats tree with the SAME module paths;
        # eval models are always built frozen, so fold them into params
        # (paths are disjoint: weight/bias vs running_mean/running_var)
        src_flat.update(flatten(raw["batch_stats"]))
    tgt_flat = flatten(target_params)
    missing = []
    new_flat = {}
    for key, tgt in tgt_flat.items():
        cand = src_flat.get(key)
        if cand is not None and np.shape(cand) == np.shape(tgt):
            new_flat[key] = np.asarray(cand).astype(np.asarray(tgt).dtype)
        else:
            new_flat[key] = tgt
            missing.append(key)
    # rebuild
    leaves_paths = jax.tree_util.tree_flatten_with_path(target_params)
    keys_in_order = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                              for k in kp)
                     for kp, _ in leaves_paths[0]]
    new_leaves = [new_flat[k] for k in keys_in_order]
    params = jax.tree_util.tree_unflatten(leaves_paths[1], new_leaves)
    if verbose and missing:
        print(f"[checkpoint] {len(missing)} keys not found/mismatched "
              f"(kept init): {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return params, missing
