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
