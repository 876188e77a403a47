"""Profiler, trace dump, sanity checker, exp log parsing."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from fgnn_tpu.utils.profiler import Profiler


def test_profiler_step_epoch_roundtrip():
    p = Profiler(level=3)
    p.set_num_step(10)
    k = p.step_key(1, 3)
    p.log_step(k, "L1_sample_time", 0.5)
    p.log_step_add(k, "L1_sample_time", 0.25)
    p.log_epoch_add(1, "epoch_total_time", 2.0)
    assert p.get_step_value(k, "L1_sample_time") == 0.75
    assert p.get_epoch_value(1, "epoch_total_time") == 2.0
    # level gating
    p2 = Profiler(level=1)
    p2.log_step(0, "L3_remap_unique_time", 1.0)
    assert p2.get_step_value(0, "L3_remap_unique_time") == 0.0


def test_trace_dump(tmp_path):
    p = Profiler(level=1)
    p.trace_event(5, "sample", 0.0, 100.0)
    p.trace_event(5, "train", 100.0, 300.0)
    out = tmp_path / "trace.json"
    p.dump_trace(str(out))
    data = json.loads(out.read_text())
    xev = [e for e in data["traceEvents"] if e.get("ph") == "X"]
    assert len(xev) == 2
    # every lane (19 reference TRACE_ITEMS + the two ad-hoc names) has a
    # thread_name metadata row
    meta = [e for e in data["traceEvents"] if e.get("ph") == "M"]
    from fgnn_tpu.utils.profiler import TRACE_ITEMS
    assert len(meta) == len(TRACE_ITEMS) + 2


def test_node_access_logging():
    p = Profiler(level=1)
    p.log_node_access = True
    p.begin_node_access_epoch()
    p.log_node_access_batch([1, 2, 2, 3, -1])
    p.begin_node_access_epoch()
    p.log_node_access_batch([2, 3, 4])
    freq = p.node_access_frequency()
    assert freq[2] == 3 and freq[-1] == 0
    sims = p.node_access_similarity()
    assert len(sims) == 1 and 0 < sims[0] <= 1
    curve = p.optimal_cache_hit_curve(10)
    assert curve[0][1] == 0.0 and abs(curve[-1][1] - 1.0) < 1e-6


def test_sanity_checker(small_ds):
    from fgnn_tpu.config import SampleType
    from fgnn_tpu.ops.padding import make_plan
    from fgnn_tpu.ops.sampling import CSRGraph, multi_layer_sample
    from fgnn_tpu.ops.sanity import EpochSanityChecker

    ds = small_ds
    g = CSRGraph(indptr=jnp.asarray(ds.indptr), indices=jnp.asarray(ds.indices))
    plan = make_plan(32, [3, 5], ds.num_node)
    seeds = jnp.full((plan.num_input_cap[0],), -1, jnp.int32).at[:32].set(
        ds.train_set[:32]
    )
    batch = multi_layer_sample(
        jax.random.key(0), g, seeds, jnp.int32(32), plan, SampleType.KHOP0
    )
    chk = EpochSanityChecker(ds.num_node)
    chk.check_batch(batch, plan)
    # same batch again in the same epoch -> duplicate train nodes
    try:
        chk.check_batch(batch, plan)
        assert False, "expected duplicate detection"
    except AssertionError as e:
        assert "twice" in str(e)


def test_exp_log_parser():
    from exp.common.runner import parse_log

    text = "config:model=gcn\nnoise\ntest_result:epoch_time=0.42\n"
    out = parse_log(text)
    assert out["config:model"] == "gcn"
    assert out["epoch_time"] == "0.42"
