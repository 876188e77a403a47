"""arch0 host-sampling engine: trains, and agrees structurally with the
on-device sampler."""
import numpy as np

from fgnn_tpu.config import RunConfig, SampleType


def test_host_engine_trains(small_ds):
    from fgnn_tpu.host_engine import HostSamplingEngine

    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=128, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0, lr=0.01,
    )
    eng = HostSamplingEngine(cfg, small_ds)
    s0 = eng.run_epoch(0)
    s1 = eng.run_epoch(1)
    assert np.isfinite(s0["loss"]) and s1["loss"] < s0["loss"] + 0.5


def test_host_np_sampler_matches_graph(small_ds):
    from fgnn_tpu.host_engine import np_multi_layer_sample
    from fgnn_tpu.ops.padding import make_plan

    ds = small_ds
    plan = make_plan(32, [3, 4], ds.num_node)
    seeds = np.full(plan.num_input_cap[0], -1, np.int32)
    seeds[:32] = ds.train_set[:32]
    rng = np.random.default_rng(0)
    batch = np_multi_layer_sample(
        rng, np.asarray(ds.indptr), np.asarray(ds.indices), seeds, 32, plan
    )
    inp = np.asarray(batch.input_nodes)
    blk = batch.blocks[0]
    mask = np.asarray(blk.mask)
    src_g = inp[np.asarray(blk.src_local)[mask]]
    dst_g = inp[np.asarray(blk.dst_local)[mask]]
    indptr, indices = np.asarray(ds.indptr), np.asarray(ds.indices)
    for s, d in zip(src_g[:100], dst_g[:100]):
        nbrs = indices[indptr[d]: indptr[d + 1]]
        assert s in nbrs
