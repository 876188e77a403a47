import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.config import SampleType
from fgnn_tpu.ops.padding import make_plan
from fgnn_tpu.ops.sampling import CSRGraph, sample_layer, multi_layer_sample


def _graph(indptr, indices):
    return CSRGraph(indptr=jnp.array(indptr), indices=jnp.array(indices))


def _neighbors_of(indptr, indices, v):
    return set(int(x) for x in indices[indptr[v]: indptr[v + 1]])


@pytest.mark.parametrize("st", [SampleType.KHOP0, SampleType.KHOP1, SampleType.KHOP2])
def test_sample_layer_valid_neighbors(tiny_graph, st):
    indptr, indices = tiny_graph
    g = _graph(indptr, indices)
    inputs = jnp.array([0, 3, 2, -1], dtype=jnp.int32)
    fanout = 3
    nbrs, valid, _ovf = sample_layer(jax.random.key(0), g, inputs, fanout, st)
    nbrs = np.asarray(nbrs).reshape(4, fanout)
    valid = np.asarray(valid).reshape(4, fanout)
    # node 0 has 3 neighbors {1,2,3}
    for j in range(fanout):
        if valid[0, j]:
            assert nbrs[0, j] in _neighbors_of(indptr, indices, 0)
    # node 2 has no neighbors -> all invalid
    assert not valid[2].any()
    assert (nbrs[2] == -1).all()
    # padding row
    assert not valid[3].any()
    # node 3 has 4 neighbors, fanout 3
    assert valid[1].all()
    for j in range(fanout):
        assert nbrs[1, j] in _neighbors_of(indptr, indices, 3)


def test_without_replacement_distinct(tiny_graph):
    indptr, indices = tiny_graph
    g = _graph(indptr, indices)
    inputs = jnp.array([3], dtype=jnp.int32)  # degree 4
    for seed in range(20):
        nbrs, valid, _ovf = sample_layer(
            jax.random.key(seed), g, inputs, 3, SampleType.KHOP2
        )
        picked = [int(x) for x in np.asarray(nbrs) if x >= 0]
        assert len(picked) == 3
        assert len(set(picked)) == 3  # distinct


def test_low_degree_takes_all(tiny_graph):
    indptr, indices = tiny_graph
    g = _graph(indptr, indices)
    inputs = jnp.array([1], dtype=jnp.int32)  # degree 2 < fanout 5
    nbrs, valid, _ovf = sample_layer(jax.random.key(0), g, inputs, 5, SampleType.KHOP0)
    picked = sorted(int(x) for x in np.asarray(nbrs) if x >= 0)
    assert picked == sorted(_neighbors_of(indptr, indices, 1))


def test_khop2_uniformity():
    """Without-replacement sampling must be uniform over neighbors."""
    n_nbr, fanout, trials = 10, 3, 800
    indptr = np.array([0, n_nbr], dtype=np.int64)
    indices = np.arange(n_nbr, dtype=np.int32)
    g = _graph(np.concatenate([indptr, [n_nbr]]), indices)  # node0 deg=10
    inputs = jnp.array([0], dtype=jnp.int32)
    f = jax.jit(
        lambda k: sample_layer(k, g, inputs, fanout, SampleType.KHOP2)[0]
    )
    counts = np.zeros(n_nbr)
    for t in range(trials):
        out = np.asarray(f(jax.random.key(t)))
        for x in out:
            if x >= 0:
                counts[x] += 1
    expected = trials * fanout / n_nbr
    assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected)), counts


def test_multi_layer_sample_structure(small_ds):
    ds = small_ds
    g = _graph(ds.indptr, ds.indices)
    B = 64
    plan = make_plan(B, [5, 10], ds.num_node)
    seeds_np = ds.train_set[:B]
    seeds = jnp.full((plan.num_input_cap[0],), -1, jnp.int32).at[:B].set(seeds_np)

    f = jax.jit(
        lambda k, s: multi_layer_sample(
            k, g, s, jnp.int32(B), plan, SampleType.KHOP2
        )
    )
    batch = f(jax.random.key(0), seeds)
    assert len(batch.blocks) == 2
    # output-side block: dst are the seeds
    out_block = batch.blocks[-1]
    assert int(out_block.num_dst) == B
    # input-side block num_src == num_input
    assert int(batch.blocks[0].num_src) == int(batch.num_input)
    # block chaining: num_src of output-side == num_dst of deeper layer...
    assert int(batch.blocks[-1].num_src) == int(batch.blocks[0].num_dst)
    assert not bool(batch.overflowed)

    # every valid edge references a valid local id, and local ids resolve to
    # real neighbors in the graph
    # Local ids index the PADDED id space (seed-region holes retained), so
    # they are bounded by the static caps, not the live counts.
    inp = np.asarray(batch.input_nodes)
    for bi, blk in enumerate(batch.blocks):
        hop = len(batch.blocks) - 1 - bi
        mask = np.asarray(blk.mask)
        src = np.asarray(blk.src_local)[mask]
        dst = np.asarray(blk.dst_local)[mask]
        assert (src >= 0).all() and (dst >= 0).all()
        assert src.max(initial=0) < plan.num_unique_cap[hop]
        assert dst.max(initial=0) < plan.num_input_cap[hop]
    # valid edges in the deepest block resolve to real (non-padding) globals
    blk0 = batch.blocks[0]
    m0 = np.asarray(blk0.mask)
    assert (inp[np.asarray(blk0.src_local)[m0]] >= 0).all()
    assert (inp[np.asarray(blk0.dst_local)[m0]] >= 0).all()

    # verify edges of the deepest block are genuine graph edges
    blk = batch.blocks[1]  # output-side: seeds are layer-1 unique prefix
    l1_unique_cap = plan.num_unique_cap[0]
    # reconstruct layer-0(sampling hop 0) global ids: seeds-first unique
    # For the output-side block, dst globals are the batch seeds and src
    # globals are hop-0's unique list == prefix of hop-1 input space.
    # We check via input_nodes of the *batch* only for the deepest block:
    blk0 = batch.blocks[0]
    mask0 = np.asarray(blk0.mask)
    src_g = inp[np.asarray(blk0.src_local)[mask0]]
    # dst ids of block0 live in hop-1's input space == prefix of input_nodes
    dst_g = inp[np.asarray(blk0.dst_local)[mask0]]
    for s_, d_ in zip(src_g[:200], dst_g[:200]):
        nb = _neighbors_of(ds.indptr, ds.indices, d_)
        assert s_ in nb


def test_multi_layer_deterministic(small_ds):
    ds = small_ds
    g = _graph(ds.indptr, ds.indices)
    B = 32
    plan = make_plan(B, [3, 5], ds.num_node)
    seeds = jnp.full((plan.num_input_cap[0],), -1, jnp.int32).at[:B].set(
        ds.train_set[:B]
    )
    f = jax.jit(
        lambda k: multi_layer_sample(
            k, g, seeds, jnp.int32(B), plan, SampleType.KHOP0
        )
    )
    b1 = f(jax.random.key(7))
    b2 = f(jax.random.key(7))
    assert np.array_equal(np.asarray(b1.input_nodes), np.asarray(b2.input_nodes))


def test_cap_bucketing_shares_programs(monkeypatch):
    """FGNN_TPU_CAP_BUCKET rounds measured caps to a coarse geometric
    grid: nearby calibrations produce IDENTICAL plans (compiled-program
    reuse), caps never shrink below the exact ones, padding overhead is
    bounded by one grid step."""
    from fgnn_tpu.ops.padding import _bucket_up

    # grid math: >= x, monotone, bounded overhead
    for steps in (4, 8):
        prev = 0
        for x in range(1, 20000, 37):
            v = _bucket_up(x, steps)
            assert v >= x
            assert v >= prev or x < prev
            assert v <= max(128, x * 2 ** (1.0 / steps) + 128)
            prev = v

    monkeypatch.setenv("FGNN_TPU_CAP_BUCKET", "4")
    p1 = make_plan(1000, [5, 10], 100_000, unique_caps=[4100, 20000])
    p2 = make_plan(1000, [5, 10], 100_000, unique_caps=[4150, 20400])
    assert p1 == p2  # nearby calibrations -> same program shapes
    monkeypatch.delenv("FGNN_TPU_CAP_BUCKET")
    pe = make_plan(1000, [5, 10], 100_000, unique_caps=[4100, 20000])
    assert all(a >= b for a, b in zip(p1.num_unique_cap, pe.num_unique_cap))
