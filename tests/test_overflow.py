"""Sampler cap overflow must be surfaced, not silently swallowed.

The padding contract (ops/padding.py) says overflow is detected at
runtime; VERDICT r1 found every engine dropped the flag. These tests
force tiny unique caps and assert the engine reports clipping.
"""
import dataclasses

import numpy as np
import pytest

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.ops.padding import make_plan


@pytest.fixture(scope="module")
def ds():
    from fgnn_tpu.data import make_synthetic_dataset

    return make_synthetic_dataset(
        num_node=3000, avg_degree=10, feat_dim=16, num_class=4, seed=11
    )


def _tiny_plan_engine(ds):
    from fgnn_tpu.engine import OneChipEngine

    cfg = RunConfig(
        model="graphsage", fanout=(8, 8), batch_size=256, num_hidden=16,
        sample_type=SampleType.KHOP0, dropout=0.0,
    )
    eng = OneChipEngine(cfg, ds)
    # caps far below what a 256-seed fanout-8 batch actually produces
    # (but >= the input cap — seeds always survive dedup)
    eng.plan = make_plan(
        cfg.batch_size, cfg.fanout, ds.num_node, scale=1.0,
        unique_caps=[300, 300],
    )
    eng.dst_caps = tuple(reversed(eng.plan.num_input_cap))
    eng._build_fns()
    return eng


class _Collect(list):
    """Minimal logging handler that records messages."""

    level = 0

    def handle(self, record):
        self.append(record.getMessage())


def _watch(logger_name="fgnn_tpu.engine"):
    import logging

    h = _Collect()
    logging.getLogger(logger_name).addHandler(h)
    return h


def test_fused_epoch_overflow_warns(ds):
    import logging

    eng = _tiny_plan_engine(ds)
    h = _watch()
    try:
        stats = eng.run_epoch(0)
    finally:
        logging.getLogger("fgnn_tpu.engine").removeHandler(h)
    assert np.isfinite(stats["loss"])
    assert any("cap overflow" in m for m in h), (
        "clipped batch did not produce an overflow warning"
    )


def test_overflow_raises_under_sanity_mode(ds):
    eng = _tiny_plan_engine(ds)
    object.__setattr__(eng.cfg, "sanity_check", True)
    with pytest.raises(RuntimeError, match="overflow"):
        eng._surface_overflow(0, True)


def test_no_false_positive(ds):
    import logging

    from fgnn_tpu.engine import OneChipEngine

    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=128, num_hidden=16,
        sample_type=SampleType.KHOP0, dropout=0.0,
    )
    eng = OneChipEngine(cfg, ds)
    h = _watch()
    try:
        eng.run_epoch(0)
    finally:
        logging.getLogger("fgnn_tpu.engine").removeHandler(h)
    assert not any("cap overflow" in m for m in h)


def test_range_margin_caps_cover_skewed_epoch():
    """Round-3 verdict item 10: 2-probe plain-max calibration can under-
    cap a skewed config (a batch later in the epoch exceeds probe-max x
    ALLOC_SCALE and is silently clipped to a warning); the shipped
    scheme (8 probes + probe-range headroom) must cover the epoch max.

    The graph mixes isolated nodes with hub-connected ones so batch
    unique counts vary strongly batch to batch.
    """
    import numpy as np

    from fgnn_tpu import constants
    from fgnn_tpu.ops.reference_impl import (calibrate_caps,
                                             np_sample_hop_vec)

    rng = np.random.default_rng(7)
    num_node, n_hub = 50_000, 500
    # 500 hub nodes with 100 distinct neighbors each; everything else is
    # a degree-1 self-loop (zero frontier growth). Small batches then
    # make per-batch hub count a heavy-tailed binomial: most batches see
    # no hub, the epoch max sees several — exactly the shape that
    # defeats a plain probe max.
    degs = np.full(num_node, 1)
    degs[:n_hub] = 100
    indptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    indices = np.empty(int(indptr[-1]), np.int32)
    region = np.arange(n_hub, num_node)
    for v in range(n_hub):
        indices[indptr[v]:indptr[v + 1]] = rng.choice(region, 100,
                                                      replace=False)
    indices[indptr[n_hub]:] = region  # self-loops for degree-1 nodes
    train = np.concatenate([
        rng.choice(np.arange(n_hub), 60, replace=False),
        rng.choice(region, 4000, replace=False),
    ]).astype(np.int32)

    fan = [25, 25]
    bs = 32

    def epoch_max(seed):
        """True per-hop max unique over every batch of a shuffled epoch."""
        r = np.random.default_rng(seed)
        perm = r.permutation(train)
        mx = [0, 0]
        for i in range(0, len(perm), bs):
            cur = np.unique(perm[i:i + bs])
            for l, f in enumerate(fan):
                nbr, valid = np_sample_hop_vec(r, indptr, indices, cur, f,
                                               False)
                cur = np.union1d(cur, nbr[valid])
                mx[l] = max(mx[l], len(cur))
        return mx

    true_max = np.maximum.reduce([epoch_max(s) for s in range(3)])

    # old scheme: 2 probes, plain max (reconstructed here)
    r = np.random.default_rng(0)
    old = [0, 0]
    for _ in range(2):
        cur = np.unique(r.choice(train, size=bs, replace=False))
        for l, f in enumerate(fan):
            nbr, valid = np_sample_hop_vec(r, indptr, indices, cur, f, False)
            cur = np.union1d(cur, nbr[valid])
            old[l] = max(old[l], len(cur))

    new = calibrate_caps(indptr, indices, train, bs, fan, seed=0)
    scale = constants.ALLOC_SCALE
    # the point of the test: this config defeats the old scheme...
    assert any(o * scale < t for o, t in zip(old, true_max)), (
        old, true_max)
    # ...and the shipped scheme covers it (cumulative component)
    for (cum, _new), t in zip(new, true_max):
        assert cum * scale >= t, (new, true_max)
    # and the PLAN built from the (cumulative, new) pairs leaves real
    # append room at every hop (the fig17a failure mode: seed block ==
    # total cap -> zero room)
    from fgnn_tpu.ops.padding import make_plan
    plan = make_plan(bs, list(reversed(fan)), 50_000, unique_caps=new)
    for s_in, s_uniq in zip(plan.num_input_cap, plan.num_unique_cap):
        assert s_uniq > s_in, plan
