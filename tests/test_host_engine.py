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


def _mk_eng(small_ds, **kw):
    from fgnn_tpu.host_engine import HostSamplingEngine

    cfg = RunConfig(
        model=kw.pop("model", "graphsage"), fanout=kw.pop("fanout", (4, 4)),
        batch_size=128, num_hidden=32, dropout=0.0, lr=0.01, **kw,
    )
    return HostSamplingEngine(cfg, small_ds)


def test_host_weighted_khop_trains(small_ds):
    eng = _mk_eng(small_ds, sample_type=SampleType.WEIGHTED_KHOP)
    r = eng.run_epoch(0)
    assert np.isfinite(r["loss"])


def test_host_weighted_hash_dedup_unique_picks(small_ds):
    """Host hash-dedup: per-vertex picks must be distinct neighbors."""
    from fgnn_tpu.host_engine import HostSamplingEngine

    eng = _mk_eng(small_ds, sample_type=SampleType.WEIGHTED_KHOP_HASH_DEDUP)
    seeds, n, _ = next(eng.shuffler.batches(0))
    b = eng._sample(np.random.default_rng(1), seeds, n)
    blk = b.blocks[-1]  # seed-side block
    f = eng.plan.fanouts[-1]
    inp = np.asarray(b.input_nodes)
    src = np.asarray(blk.src_local).reshape(-1, f)
    msk = np.asarray(blk.mask).reshape(-1, f)
    indptr = np.asarray(small_ds.indptr)
    for i in range(min(64, len(src))):
        live = inp[src[i][msk[i]]]
        assert len(set(live.tolist())) == len(live), (i, live)
        # deg <= fanout vertices must take ALL neighbors
        d = int(np.asarray(blk.dst_local).reshape(-1, f)[i][msk[i]][0]) \
            if msk[i].any() else -1
        if d >= 0:
            g = inp[d]
            deg = int(indptr[g + 1] - indptr[g])
            if deg <= f:
                assert len(live) == deg, (g, deg, live)
    r = eng.run_epoch(0)
    assert np.isfinite(r["loss"])


def test_host_random_walk_pinsage_trains(small_ds):
    eng = _mk_eng(
        small_ds, model="pinsage", sample_type=SampleType.RANDOM_WALK,
        num_random_walk=4, random_walk_length=3,
        random_walk_restart_prob=0.5, num_neighbor=3, num_layer_rw=2,
    )
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"]) and np.isfinite(r1["loss"])
    # RW blocks must carry visit-count weights for WeightedSAGEConv
    seeds, n, _ = next(eng.shuffler.batches(0))
    b = eng._sample(np.random.default_rng(2), seeds, n)
    assert b.blocks[0].weights is not None
    w = np.asarray(b.blocks[0].weights)
    assert (w[np.asarray(b.blocks[0].mask)] >= 1).all()
