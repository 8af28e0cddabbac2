"""Multi-device eval dryrun: two evaluator ranks, each pinned to its own
(virtual CPU) device, covering disjoint halves of a dataset — the
multi-chip inference deployment shape (reference uses one mp.Queue-fed
process per GPU, evaluator.py:216-235; here rank/world striding + one
device per rank)."""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.configs import build_config
from aot_tpu.data.eval_datasets import EvalTestFixture
from aot_tpu.eval.evaluator import Evaluator
from aot_tpu.models import build_vos_model


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
@pytest.mark.slow
def test_two_rank_eval_on_two_devices(tmp_path):
    cfg = build_config(stage="pre", model="aott", TEST_DATASET="test")
    cfg.TEST_MULTISCALE = [1.0]
    model = build_vos_model(cfg, eval_mode=True)
    h = w = 65
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 11)))["params"]

    world = 2
    seqs_done = {}
    n_seqs = 3
    for rank in range(world):
        root = str(tmp_path / f"rank{rank}")
        with jax.default_device(jax.devices()[rank]):
            dev_params = jax.device_put(params, jax.devices()[rank])
            ev = Evaluator(cfg, model, dev_params, rank=rank, world=world,
                           result_root=root)
            ds = EvalTestFixture(n_seqs=n_seqs, n_frames=4, size=128)
            for idx in range(len(ds)):
                if idx % world != rank:
                    continue
                ev.eval_sequence(ds[idx])
        seqs_done[rank] = sorted(os.listdir(root))

    # disjoint and exhaustive across ranks, masks written per frame
    all_seqs = sorted(s for seqs in seqs_done.values() for s in seqs)
    assert all_seqs == [f"test{i}" for i in range(n_seqs)]
    assert not set(seqs_done[0]) & set(seqs_done[1])
    for rank, seqs in seqs_done.items():
        for s in seqs:
            pngs = os.listdir(os.path.join(str(tmp_path / f"rank{rank}"), s))
            assert len(pngs) == 3  # frames 1..3 (frame 0 is the reference)
