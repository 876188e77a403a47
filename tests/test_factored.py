"""Multi-chip engines on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

from fgnn_tpu.config import CachePolicy, RunConfig, SampleType


@pytest.fixture(scope="module")
def ds():
    from fgnn_tpu.data import make_synthetic_dataset

    return make_synthetic_dataset(
        num_node=2000, avg_degree=8, feat_dim=16, num_class=4, seed=11
    )


def test_factored_engine_runs(ds):
    import jax
    from fgnn_tpu.parallel.factored import FactoredEngine

    assert len(jax.devices()) >= 8
    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=64, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0, lr=0.01,
        num_sample_worker=2, num_train_worker=4,
    )
    eng = FactoredEngine(cfg, ds)
    s0 = eng.run_epoch(0)
    s1 = eng.run_epoch(1)
    assert np.isfinite(s0["loss"]) and np.isfinite(s1["loss"])
    assert s1["loss"] < s0["loss"] + 0.5  # roughly not diverging


def test_factored_with_presample_cache(ds):
    from fgnn_tpu.parallel.factored import FactoredEngine
    from fgnn_tpu.utils.profiler import Profiler

    Profiler.reset()
    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=64, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0,
        num_sample_worker=1, num_train_worker=2,
        cache_policy=CachePolicy.PRESAMPLE, cache_percentage=0.2,
        presample_epoch=1,
    )
    eng = FactoredEngine(cfg, ds, feat_on_trainer=False)
    s = eng.run_epoch(0)
    assert np.isfinite(s["loss"])
    # presample cache on a skewed graph must beat the 20% random baseline
    from fgnn_tpu.utils.profiler import Profiler
    prof = Profiler.get()
    feat_b = prof.get_epoch_value(0, "epoch_feature_bytes")
    miss_b = prof.get_epoch_value(0, "epoch_miss_bytes")
    if feat_b > 0:
        hit_rate = 1.0 - miss_b / feat_b
        assert hit_rate > 0.2, f"presample hit rate {hit_rate:.2f} too low"


def test_sgnn_engine_runs(ds):
    from fgnn_tpu.parallel.factored import SGNNEngine

    cfg = RunConfig(
        model="gcn", fanout=(4, 4), batch_size=64, num_hidden=32,
        sample_type=SampleType.KHOP2, dropout=0.0,
        num_train_worker=4,
    )
    eng = SGNNEngine(cfg, ds)
    s0 = eng.run_epoch(0)
    assert np.isfinite(s0["loss"])
    assert s0["num_step"] == eng.num_local_step * 4
