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
    assert "kL0Event_Train_Step" in names
    assert all(e["dur"] >= 0 for e in events if e.get("ph") == "X")


def test_trace_event_taxonomy(tmp_path, monkeypatch):
    """The de-fused trace covers the reference's event levels
    (profiler.h:142-176): L0 step, L1 sample/copy/train, L3 cache stages."""
    monkeypatch.setenv("FGNN_TPU_DUMP_TRACE", "1")
    monkeypatch.setenv("FGNN_TPU_FEAT_HBM_BUDGET", "0")
    from fgnn_tpu.utils.profiler import Profiler

    Profiler.reset()
    from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.engine import OneChipEngine

    ds = make_synthetic_dataset(num_node=2000, avg_degree=8, feat_dim=16,
                                num_class=4, seed=3)
    cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=128,
                    num_hidden=32, sample_type=SampleType.KHOP0, dropout=0.0,
                    cache_policy=CachePolicy.DEGREE, cache_percentage=0.2)
    eng = OneChipEngine(cfg, ds)
    eng.run_epoch(0)
    p = Profiler.get()
    path = str(tmp_path / "trace2.json")
    p.dump_trace(path)
    names = {e["name"] for e in json.load(open(path))["traceEvents"]}
    for want in ("kL0Event_Train_Step", "kL1Event_Sample", "kL1Event_Train",
                 "kL1Event_Copy", "kL2Event_Copy_CacheCopy",
                 "kL3Event_Copy_CacheCopy_GetIndex",
                 "kL3Event_Copy_CacheCopy_ExtractMiss",
                 "kL3Event_Copy_CacheCopy_CopyMiss",
                 "kL3Event_Copy_CacheCopy_CombineMiss"):
        assert want in names, (want, names)
    # every emitted reference-lane name is in the canonical taxonomy and
    # every lane has a named thread row in the dump
    from fgnn_tpu.utils.profiler import TRACE_ITEMS
    assert set(TRACE_ITEMS) >= {n for n in names if n.startswith("k")}
    meta = {e["args"]["name"] for e in json.load(open(path))["traceEvents"]
            if e.get("ph") == "M"}
    assert set(TRACE_ITEMS) <= meta


def test_trace_sgnn_waves(tmp_path, monkeypatch):
    monkeypatch.setenv("FGNN_TPU_DUMP_TRACE", "1")
    from fgnn_tpu.utils.profiler import Profiler

    Profiler.reset()
    import fgnn_tpu.session as sam

    sam._reset_for_tests()
    sam.config(dict(dataset="synthetic", model="graphsage", arch="arch6",
                    fanout=(3, 3), batch_size=32, num_epoch=1,
                    sample_type="khop0", synthetic_nodes=1000, dropout=0.0,
                    num_sample_worker=2, num_train_worker=2))
    sam.data_init(); sam.sample_init(0); sam.train_init(0)
    sam._session.engine.run_epoch(0)
    path = str(tmp_path / "trace3.json")
    Profiler.get().dump_trace(path)
    names = {e["name"] for e in json.load(open(path))["traceEvents"]}
    for want in ("kL1Event_Sample", "kL1Event_Copy", "kL1Event_Train"):
        assert want in names, (want, names)
    sam.shutdown()
