"""Evaluator rank/world sequence sharding is disjoint and exhaustive."""

from aot_tpu.data.eval_datasets import EvalTestFixture


def test_rank_striding_partitions_sequences():
    ds = EvalTestFixture(n_seqs=7)
    world = 3
    assigned = {r: [i for i in range(len(ds)) if i % world == r]
                for r in range(world)}
    all_idx = sorted(i for idxs in assigned.values() for i in idxs)
    assert all_idx == list(range(len(ds)))
    flat = [i for idxs in assigned.values() for i in idxs]
    assert len(flat) == len(set(flat))
