"""End-to-end single-chip training (arch1 analog): loss must decrease."""
import numpy as np
import pytest

from fgnn_tpu.config import RunConfig, SampleType


@pytest.fixture(scope="module")
def ds():
    from fgnn_tpu.data import make_synthetic_dataset

    return make_synthetic_dataset(
        num_node=3000, avg_degree=10, feat_dim=32, num_class=4, seed=7
    )


def _run(cfg, ds, epochs=3):
    from fgnn_tpu.engine import OneChipEngine

    eng = OneChipEngine(cfg, ds)
    stats = [eng.run_epoch(e) for e in range(epochs)]
    return eng, stats


def test_graphsage_learns(ds):
    # labels correlated with features? synthetic labels are random — use a
    # learnable objective instead: predict label of self via features won't
    # learn on random labels. We check the loop runs and loss is finite and
    # decreasing on the training set (memorization is possible).
    cfg = RunConfig(
        model="graphsage", fanout=(5, 5), batch_size=256, num_epoch=3,
        num_hidden=64, sample_type=SampleType.KHOP0, cache_percentage=0.0,
        dropout=0.0, lr=0.01,
    )
    eng, stats = _run(cfg, ds, epochs=4)
    losses = [s["loss"] for s in stats]
    assert all(np.isfinite(l) for l in losses)
    # memorize random labels a bit: loss should drop from epoch 0 to last
    assert losses[-1] < losses[0]


def test_gcn_runs(ds):
    cfg = RunConfig(
        model="gcn", fanout=(5, 5), batch_size=256, num_hidden=32,
        sample_type=SampleType.KHOP2, dropout=0.5,
    )
    eng, stats = _run(cfg, ds, epochs=1)
    assert np.isfinite(stats[0]["loss"])


def test_pinsage_runs(ds):
    cfg = RunConfig(
        model="pinsage", batch_size=128, num_hidden=32,
        sample_type=SampleType.RANDOM_WALK, num_layer_rw=2,
        num_random_walk=3, random_walk_length=2, num_neighbor=3,
    )
    eng, stats = _run(cfg, ds, epochs=1)
    assert np.isfinite(stats[0]["loss"])


def test_gat_runs(ds):
    cfg = RunConfig(
        model="gat", fanout=(5, 5), batch_size=128, num_hidden=16,
        sample_type=SampleType.KHOP0,
    )
    eng, stats = _run(cfg, ds, epochs=1)
    assert np.isfinite(stats[0]["loss"])


def test_evaluate(ds):
    cfg = RunConfig(
        model="graphsage", fanout=(5, 5), batch_size=256, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0,
    )
    eng, _ = _run(cfg, ds, epochs=1)
    acc = eng.evaluate()
    assert 0.0 <= acc <= 1.0
