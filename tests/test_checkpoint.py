"""Checkpoint IO: roundtrip, keep-last GC, partial/prefix-tolerant load."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from aot_tpu.utils import checkpoint as C


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {"a": {"w": rng.randn(4, 3).astype(np.float32)},
            "b": rng.randn(7).astype(np.float32)}


def test_roundtrip_and_gc(tmp_path):
    d = str(tmp_path)
    for step in range(1, 12):
        C.save_checkpoint(d, step, _tree(step), max_keep=3)
    paths = C.list_checkpoints(d)
    assert len(paths) == 3
    assert C.latest_checkpoint(d).endswith("save_step_11.msgpack")
    restored = C.load_pytree(paths[-1], _tree(0))
    np.testing.assert_allclose(restored["a"]["w"], _tree(11)["a"]["w"])


def test_resolve(tmp_path):
    d = str(tmp_path)
    C.save_checkpoint(d, 5, _tree())
    C.save_checkpoint(d, 10, _tree())
    assert C.resolve_checkpoint(d).endswith("save_step_10.msgpack")
    assert C.resolve_checkpoint(d, step=5).endswith("save_step_5.msgpack")
    assert C.resolve_checkpoint(d, path="x.pth") == "x.pth"


def test_partial_load_shape_tolerant(tmp_path):
    d = str(tmp_path)
    src = _tree(1)
    C.save_pytree(src, os.path.join(d, "p.msgpack"))
    target = {"a": {"w": np.zeros((4, 3), np.float32)},
              "b": np.zeros((9,), np.float32),  # shape mismatch -> kept
              "c": np.ones((2,), np.float32)}   # missing in file -> kept
    out, missing = C.load_params_partial(os.path.join(d, "p.msgpack"), target,
                                         verbose=False)
    np.testing.assert_allclose(out["a"]["w"], src["a"]["w"])
    np.testing.assert_allclose(out["b"], target["b"])
    np.testing.assert_allclose(out["c"], target["c"])
    assert set(m.split(" ")[0] for m in missing) == {"b", "c"}


def test_partial_load_unwraps_trainstate_dump(tmp_path):
    d = str(tmp_path)
    C.save_pytree({"params": _tree(2), "step": 7}, os.path.join(d, "s.msgpack"))
    out, missing = C.load_params_partial(os.path.join(d, "s.msgpack"),
                                         _tree(0), verbose=False)
    np.testing.assert_allclose(out["b"], _tree(2)["b"])
    assert not missing
