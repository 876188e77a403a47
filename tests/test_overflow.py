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
