"""Degree-tiered last hop (PERF.md round 5; ops/sampling._tiered_last_hop).

The tiered layout must be invisible semantically: identical sampling
distribution (uniform without replacement; take-all == Floyd at
fanout >= deg), and aggregation/softmax/in-degree results identical to
the generic segment path on the same edges.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine
from fgnn_tpu.models.aggregate import (
    in_degrees,
    segment_agg,
    segment_softmax,
)
from fgnn_tpu.ops.padding import make_plan
from fgnn_tpu.ops.sampling import CSRGraph, multi_layer_sample


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(num_node=5000, avg_degree=12, feat_dim=16,
                                  num_class=4, seed=11)


def tiered_plan(ds, batch_size=256, fanouts=(25, 10)):
    from fgnn_tpu.ops.reference_impl import calibrate_caps

    fan_sampling = list(reversed(fanouts))
    caps, tier_stats = calibrate_caps(
        np.asarray(ds.indptr), np.asarray(ds.indices),
        np.asarray(ds.train_set), batch_size, fan_sampling, seed=0,
        tier_candidates=(4, 6, 8, 10, 12, 16),
    )
    plan = make_plan(batch_size, fanouts, ds.num_node, unique_caps=caps,
                     tier_stats=tier_stats)
    assert plan.tier_a_cap is not None, "tier must engage on skewed graph"
    return plan


def graph_of(ds):
    return CSRGraph(indptr=jnp.asarray(np.asarray(ds.indptr)),
                    indices=jnp.asarray(np.asarray(ds.indices)))


def sample_tiered(ds, plan, key=0):
    g = graph_of(ds)
    seeds_np = np.full((plan.num_input_cap[0],), -1, np.int32)
    picks = np.random.default_rng(key).choice(
        np.asarray(ds.train_set), size=plan.batch_size, replace=False
    )
    seeds_np[:plan.batch_size] = picks
    batch = jax.jit(
        lambda k: multi_layer_sample(
            jax.random.key(k), g, jnp.asarray(seeds_np),
            jnp.int32(plan.batch_size), plan, SampleType.KHOP2,
            dedup_last_hop=False,
        )
    )(key)
    return batch


@pytest.mark.fast
def test_tiered_sampling_distribution(ds):
    """Per-dst: deg<=fB vertices take ALL neighbors exactly once;
    deg>fB vertices get min(deg, f) DISTINCT true neighbors."""
    plan = tiered_plan(ds)
    batch = sample_tiered(ds, plan)
    assert not bool(batch.overflowed)
    blk = batch.blocks[0]           # deepest block (tiered)
    assert blk.tier_split is not None
    indptr = np.asarray(ds.indptr)
    indices = np.asarray(ds.indices)
    frontier = np.asarray(batch.blocks[1].num_src)  # hop-0 unique count
    fr_ids = np.asarray(
        # input to the last hop == unique list after hop 0: the first
        # num_src entries of the PREVIOUS hop's unique output, which is
        # exactly input_nodes[:V] of the no-dedup concat
        batch.input_nodes
    )[: blk.dst_local.shape[0] // 1]
    V = np.asarray(blk.dst_invperm).shape[0]
    fr_ids = np.asarray(batch.input_nodes)[:V]
    mask = np.asarray(blk.mask)
    dst = np.asarray(blk.dst_local)[mask]
    nbr = np.asarray(batch.input_nodes)[V:][mask]   # slot j -> input V+j
    f = plan.fanouts[-1]
    fB = plan.tier_b_fanout
    per_dst = {}
    for d, nb in zip(dst, nbr):
        per_dst.setdefault(int(d), []).append(int(nb))
    from collections import Counter

    checked_small = checked_big = 0
    for d, nbs in per_dst.items():
        vid = fr_ids[d]
        assert vid >= 0
        true_nbrs = indices[indptr[vid]:indptr[vid + 1]].tolist()
        deg = len(true_nbrs)
        # sampling is over CSR SLOTS; the synthetic graph is a multigraph
        # (duplicate neighbor ids in one adjacency list), so compare
        # multisets — duplicate ids may appear, each from a distinct slot
        assert not (Counter(nbs) - Counter(true_nbrs))
        if deg <= fB:
            assert sorted(nbs) == sorted(true_nbrs), (
                f"small-tier dst {d} (deg {deg}) must take all neighbors"
            )
            checked_small += 1
        else:
            assert len(nbs) == min(deg, f)
            checked_big += 1
    assert checked_small > 10 and checked_big > 10


@pytest.mark.fast
def test_tiered_agg_matches_generic_segment_path(ds):
    """segment_agg / in_degrees / segment_softmax on a tiered block must
    equal the generic (dst_local scatter) path on the same edges."""
    plan = tiered_plan(ds)
    batch = sample_tiered(ds, plan)
    blk = batch.blocks[0]
    V = np.asarray(blk.dst_invperm).shape[0]
    E = blk.mask.shape[0]
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.standard_normal((E, 8)).astype(np.float32))
    w = jnp.asarray(rng.random(E).astype(np.float32) + 0.1)
    generic = blk.replace(tier_split=None, dst_invperm=None)
    for mode in ("sum", "mean"):
        a = segment_agg(msgs, blk, V, mode=mode)
        b = segment_agg(msgs, generic, V, mode=mode)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    a = segment_agg(msgs, blk, V, mode="weighted_mean", edge_weights=w)
    b = segment_agg(msgs, generic, V, mode="weighted_mean", edge_weights=w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(in_degrees(blk, V)), np.asarray(in_degrees(generic, V))
    )
    scores = jnp.asarray(rng.standard_normal((E, 3)).astype(np.float32))
    sa = np.asarray(segment_softmax(scores, blk, V))
    sb = np.asarray(segment_softmax(scores, generic, V))
    np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_tiered_engine_matches_untiered_loss(ds, monkeypatch):
    """End-to-end: tiered vs untiered engines differ only in RNG stream
    mapping — edge counts are IDENTICAL (valid count is deterministic
    for without-replacement sampling) and losses stay close."""
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=256,
                    num_hidden=32, sample_type=SampleType.KHOP2,
                    dropout=0.0, lr=0.01)
    eng_t = OneChipEngine(cfg, ds)
    assert eng_t.plan.tier_a_cap is not None
    monkeypatch.setenv("FGNN_TPU_TIERED_HOP", "0")
    eng_u = OneChipEngine(cfg, ds)
    assert eng_u.plan.tier_a_cap is None
    for e in range(2):
        rt = eng_t.run_epoch(e)
        ru = eng_u.run_epoch(e)
        assert rt["sampled_edges"] == ru["sampled_edges"]
        assert abs(rt["loss"] - ru["loss"]) / abs(ru["loss"]) < 0.05
    assert rt["loss"] < 2.0  # actually learning


@pytest.mark.fast
def test_tiered_gat_runs(ds):
    cfg = RunConfig(model="gat", fanout=(10, 5), batch_size=128,
                    num_hidden=16, sample_type=SampleType.KHOP0,
                    dropout=0.0)
    eng = OneChipEngine(cfg, ds)
    if eng.plan.tier_a_cap is None:
        pytest.skip("tier did not engage at this shape")
    r = eng.run_epoch(0)
    assert np.isfinite(r["loss"])
