"""Pipelined fused epoch (FGNN_TPU_PIPELINE_EPOCH) is bit-identical.

The pipelined scan trains on iteration i-1's batch while producing
iteration i's — only the schedule changes, not the math: same seeds,
same fold_in keys, same step order. Losses and final params must match
the sequential epoch_fused exactly.
"""
import os

import numpy as np
import pytest

import jax

from fgnn_tpu.config import RunConfig, SampleType


@pytest.fixture(scope="module")
def ds():
    from fgnn_tpu.data import make_synthetic_dataset

    return make_synthetic_dataset(
        num_node=3000, avg_degree=10, feat_dim=32, num_class=4, seed=7
    )


def _run(ds, pipeline, epochs=2):
    from fgnn_tpu.engine import OneChipEngine

    os.environ["FGNN_TPU_PIPELINE_EPOCH"] = "1" if pipeline else "0"
    try:
        cfg = RunConfig(
            model="graphsage", fanout=(5, 5), batch_size=256,
            num_hidden=64, sample_type=SampleType.KHOP2,
            cache_percentage=0.0, dropout=0.5, lr=0.01,
        )
        eng = OneChipEngine(cfg, ds)
        stats = [eng.run_epoch(e) for e in range(epochs)]
        return eng, stats
    finally:
        os.environ.pop("FGNN_TPU_PIPELINE_EPOCH", None)


def test_pipelined_epoch_bit_identical(ds):
    eng_a, stats_a = _run(ds, pipeline=False)
    eng_b, stats_b = _run(ds, pipeline=True)
    for sa, sb in zip(stats_a, stats_b):
        assert sa["loss"] == sb["loss"], (sa, sb)
        assert sa["acc"] == sb["acc"]
        assert sa["sampled_edges"] == sb["sampled_edges"]
    pa = jax.tree.leaves(eng_a.state.params)
    pb = jax.tree.leaves(eng_b.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_perstep_fused_bit_identical(ds):
    """FGNN_TPU_PERSTEP_FUSED dispatches the same fused step per step —
    identical losses/params to the scanned epoch (only dispatch differs)."""
    from fgnn_tpu.engine import OneChipEngine
    from fgnn_tpu.config import RunConfig, SampleType

    def run(perstep):
        os.environ["FGNN_TPU_PERSTEP_FUSED"] = "1" if perstep else "0"
        try:
            cfg = RunConfig(
                model="graphsage", fanout=(5, 5), batch_size=256,
                num_hidden=64, sample_type=SampleType.KHOP2,
                cache_percentage=0.0, dropout=0.5, lr=0.01,
            )
            eng = OneChipEngine(cfg, ds)
            stats = [eng.run_epoch(e) for e in range(2)]
            return eng, stats
        finally:
            os.environ.pop("FGNN_TPU_PERSTEP_FUSED", None)

    eng_a, stats_a = run(False)
    eng_b, stats_b = run(True)
    for sa, sb in zip(stats_a, stats_b):
        assert np.allclose(sa["loss"], sb["loss"], rtol=1e-6), (sa, sb)
        assert sa["sampled_edges"] == sb["sampled_edges"]
    for a, b in zip(jax.tree.leaves(eng_a.state.params),
                    jax.tree.leaves(eng_b.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_single_step_epoch(ds):
    """steps == 1 exercises the empty-scan prologue/epilogue edges."""
    from fgnn_tpu.engine import OneChipEngine

    os.environ["FGNN_TPU_PIPELINE_EPOCH"] = "1"
    try:
        cfg = RunConfig(
            model="graphsage", fanout=(5, 5), batch_size=512,
            num_hidden=32, sample_type=SampleType.KHOP2,
            cache_percentage=0.0, dropout=0.0, lr=0.01,
        )
        eng = OneChipEngine(cfg, ds)  # 300 train seeds -> single step
        assert eng.shuffler.num_step == 1
        r = eng.run_epoch(0)
        assert np.isfinite(r["loss"])
    finally:
        os.environ.pop("FGNN_TPU_PIPELINE_EPOCH", None)


def test_run_epochs_matches_sequential(small_ds):
    """run_epochs (back-to-back fused dispatch, one stats fetch) is a
    SCHEDULING change: losses, sampled edges and final params must match
    sequential run_epoch calls exactly."""
    import jax

    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.engine import OneChipEngine

    cfg = RunConfig(model="graphsage", fanout=(3, 5), batch_size=64,
                    num_hidden=32, sample_type=SampleType.KHOP0,
                    dropout=0.0, num_epoch=3)

    eng_a = OneChipEngine(cfg, small_ds)
    seq = [eng_a.run_epoch(e) for e in range(3)]
    eng_b = OneChipEngine(cfg, small_ds)
    piped = eng_b.run_epochs(0, 3)

    for a, b in zip(seq, piped):
        assert a["loss"] == b["loss"], (a, b)
        assert a["sampled_edges"] == b["sampled_edges"]
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.tree.map(np.asarray, eng_a.state.params),
        jax.tree.map(np.asarray, eng_b.state.params),
    )
