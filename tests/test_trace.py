"""Chrome-trace dump (FGNN_TPU_DUMP_TRACE / samgraph_dump_trace analog)."""
import json
import os

import numpy as np


def test_trace_dump(tmp_path, monkeypatch):
    monkeypatch.setenv("FGNN_TPU_DUMP_TRACE", "1")
    from fgnn_tpu.utils.profiler import Profiler

    Profiler.reset()
    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.engine import OneChipEngine

    ds = make_synthetic_dataset(num_node=2000, avg_degree=8, feat_dim=16,
                                num_class=4, seed=3)
    cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=128,
                    num_hidden=32, sample_type=SampleType.KHOP0, dropout=0.0)
    eng = OneChipEngine(cfg, ds)
    eng.run_epoch(0)
    p = Profiler.get()
    path = str(tmp_path / "trace.json")
    p.dump_trace(path)
    data = json.load(open(path))
    events = data["traceEvents"]
    assert events, "no trace events recorded"
    names = {e["name"] for e in events}
    assert "train_fused" in names
    assert all(e["dur"] >= 0 for e in events)
