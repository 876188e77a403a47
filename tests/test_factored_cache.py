"""arch5 with host-resident features: sampler-side miss index + cache."""
import numpy as np

from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.parallel.factored import FactoredEngine
from fgnn_tpu.utils.profiler import Profiler


def test_factored_cache_mode():
    Profiler.reset()
    ds = make_synthetic_dataset(num_node=3000, avg_degree=10, feat_dim=32,
                                num_class=4, seed=7)
    cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=64,
                    num_hidden=32, sample_type=SampleType.KHOP0,
                    dropout=0.0, lr=0.01,
                    num_sample_worker=2, num_train_worker=2,
                    cache_policy=CachePolicy.PRESAMPLE,
                    cache_percentage=0.2)
    eng = FactoredEngine(cfg, ds, feat_on_trainer=False)
    assert eng.cache is not None
    assert eng.index_wave is not None, "sampler-side split not built"
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"])
    assert r1["loss"] < r0["loss"]
    p = Profiler.get()
    fb = p.get_epoch_value(1, "epoch_feature_bytes")
    mb = p.get_epoch_value(1, "epoch_miss_bytes")
    assert fb > 0 and 0 < mb < fb, (mb, fb)   # some hits, some misses


def test_pipelined_matches_serial():
    """The 2-stage group pipeline (host gather of group k+1 under train
    wave k) must be a pure scheduling change: identical loss sequence to
    the serial path (which profile_level>=2 forces)."""
    ds = make_synthetic_dataset(num_node=2500, avg_degree=8, feat_dim=16,
                                num_class=4, seed=3)

    def run(profile_level):
        Profiler.reset()
        Profiler.get().level = profile_level
        cfg = RunConfig(model="graphsage", fanout=(3, 3), batch_size=64,
                        num_hidden=16, sample_type=SampleType.KHOP0,
                        dropout=0.0, lr=0.01,
                        num_sample_worker=2, num_train_worker=2,
                        cache_policy=CachePolicy.DEGREE,
                        cache_percentage=0.2, profile_level=profile_level)
        eng = FactoredEngine(cfg, ds, feat_on_trainer=False)
        assert eng._prof_stages == (profile_level >= 2)
        return [eng.run_epoch(e)["loss"] for e in range(2)]

    pipelined = run(1)   # pipeline active
    serial = run(2)      # stage timers force the serial path
    np.testing.assert_allclose(pipelined, serial, rtol=1e-6)
