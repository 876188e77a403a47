"""Opt-in runtime sanity checking (SAMGRAPH_SANITY_CHECK analog)."""
import numpy as np

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine


def test_sanity_mode_passes_on_clean_engine():
    ds = make_synthetic_dataset(num_node=2000, avg_degree=8, feat_dim=16,
                                num_class=4, seed=3)
    cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=128,
                    num_hidden=32, sample_type=SampleType.KHOP0,
                    dropout=0.0, sanity_check=True)
    eng = OneChipEngine(cfg, ds)
    assert eng.sanity is not None
    r = eng.run_epoch(0)       # checks run per step; any violation asserts
    assert np.isfinite(r["loss"])
