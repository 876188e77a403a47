"""3-layer configs (the reference's GCN default fanout [5,10,15])."""
import numpy as np

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine


def test_three_layer_gcn_trains():
    ds = make_synthetic_dataset(num_node=3000, avg_degree=10, feat_dim=16,
                                num_class=4, seed=11)
    cfg = RunConfig(model="gcn", fanout=(5, 10, 15), batch_size=128,
                    num_hidden=32, sample_type=SampleType.KHOP2,
                    dropout=0.0, lr=0.01)
    eng = OneChipEngine(cfg, ds)
    assert eng.plan.num_layer == 3
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    r2 = eng.run_epoch(2)
    assert np.isfinite(r0["loss"])
    assert r2["loss"] < r0["loss"]
