"""Native (C++/OpenMP) host samplers: weighted khop + random walk.

Reference analogs: cpu_sampling_weighted_khop.cc,
cpu_sampling_weighted_khop_hash_dedup.cu semantics (per-vertex-unique
picks), cpu_sampling_random_walk.cc + FrequencyHashmap. Each test checks
validity invariants exactly and the sampling distribution statistically
against the edge weights / the NumPy golden.
"""
import numpy as np
import pytest

from fgnn_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _star_graph(deg, weights):
    """Vertex 0 with `deg` neighbors 1..deg, given edge weights."""
    indptr = np.zeros(deg + 2, dtype=np.int64)
    indptr[1] = deg
    indptr[2:] = deg
    indices = np.arange(1, deg + 1, dtype=np.int32)
    gcum = np.cumsum(np.asarray(weights, dtype=np.float64))
    return indptr, indices, gcum


def test_weighted_khop_matches_weights():
    deg = 8
    w = np.array([1, 1, 1, 1, 2, 2, 4, 8], dtype=np.float64)
    indptr, indices, gcum = _star_graph(deg, w)
    n_draw = 4000
    inputs = np.zeros(n_draw, dtype=np.int32)
    out = native.sample_weighted_khop(indptr, indices, gcum, inputs,
                                      fanout=1, seed=7)
    assert out is not None and out.shape == (n_draw, 1)
    counts = np.bincount(out[:, 0], minlength=deg + 1)[1:]
    emp = counts / counts.sum()
    exp = w / w.sum()
    assert np.abs(emp - exp).max() < 0.03, (emp, exp)


def test_weighted_khop_dedup_unique_and_take_all():
    deg = 10
    w = np.ones(deg)
    indptr, indices, gcum = _star_graph(deg, w)
    inputs = np.zeros(64, dtype=np.int32)
    out = native.sample_weighted_khop(indptr, indices, gcum, inputs,
                                      fanout=6, seed=3, dedup=True)
    for row in out:
        real = row[row >= 0]
        assert len(real) == 6
        assert len(set(real.tolist())) == 6  # unique picks
    # take-all when deg <= fanout
    out2 = native.sample_weighted_khop(indptr, indices, gcum, inputs,
                                       fanout=16, seed=3, dedup=True)
    for row in out2:
        assert sorted(row[row >= 0].tolist()) == list(range(1, deg + 1))


def test_weighted_khop_padding_and_zero_degree():
    indptr = np.array([0, 2, 2], dtype=np.int64)  # vertex 1 has deg 0
    indices = np.array([0, 1], dtype=np.int32)
    gcum = np.cumsum([1.0, 1.0])
    inputs = np.array([0, 1, -1], dtype=np.int32)
    out = native.sample_weighted_khop(indptr, indices, gcum, inputs,
                                      fanout=3, seed=1)
    assert (out[0] >= 0).all()
    assert (out[1] == -1).all() and (out[2] == -1).all()


def test_random_walk_matches_numpy_golden_distribution(monkeypatch):
    rng = np.random.default_rng(0)
    num_node, avg_deg = 300, 6
    deg = rng.integers(1, avg_deg * 2, num_node)
    indptr = np.zeros(num_node + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, num_node, indptr[-1]).astype(np.int32)

    K, W, L, restart = 4, 6, 3, 0.2
    inputs = rng.integers(0, num_node, 500).astype(np.int32)
    nbr, w = native.sample_random_walk(indptr, indices, inputs, W, L,
                                       restart, K, seed=11)
    # invariants: weights positive where neighbor set, padding -1/0
    assert ((nbr >= 0) == (w > 0)).all()
    # every reported neighbor is reachable within L hops — check hop-1
    # reachability of the walk's recorded visits instead: first visit of
    # every walk starts from the seed's adjacency, so at least one
    # reported neighbor per seed must be a direct neighbor (W*L >> K).
    hit = 0
    for i, v in enumerate(inputs[:100]):
        direct = set(indices[indptr[v]:indptr[v + 1]].tolist())
        row = set(nbr[i][nbr[i] >= 0].tolist())
        if row & direct:
            hit += 1
    assert hit > 80

    # distribution vs the NumPy golden (native path disabled for the
    # golden call): weighted visit histogram over identical seeds,
    # restricted to the seed's direct neighborhood where most of the
    # visit mass lands, must agree within statistical tolerance
    import fgnn_tpu.host_engine as he

    seeds = np.zeros(2000, dtype=np.int32)  # same start vertex
    n_nbr, n_w = native.sample_random_walk(indptr, indices, seeds, W, L,
                                           restart, K, seed=5)
    monkeypatch.setattr(native, "sample_random_walk",
                        lambda *a, **k: None)
    g_nbr, g_w = he._np_random_walk_hop(
        np.random.default_rng(5), indptr, indices, seeds, K, W, L, restart
    )

    def hist(a, weights):
        h = np.zeros(num_node)
        m = a >= 0
        np.add.at(h, a[m], weights[m])
        return h / max(h.sum(), 1)

    h_nat = hist(n_nbr, n_w)
    h_gold = hist(g_nbr, g_w)
    direct = np.unique(indices[indptr[0]:indptr[1]])
    # per-direct-neighbor mass within 2 points; bulk mass on the
    # neighborhood within 3 points
    assert np.abs(h_nat[direct] - h_gold[direct]).max() < 0.02
    assert abs(h_nat[direct].sum() - h_gold[direct].sum()) < 0.03


def test_host_engine_uses_native_weighted(tiny_graph):
    """End-to-end arch0 weighted run goes through the native sampler
    without shape/validity regressions."""
    indptr, indices = tiny_graph[0], tiny_graph[1]
    gcum = np.cumsum(np.ones(len(indices), dtype=np.float64))
    from fgnn_tpu.host_engine import _np_weighted_hop

    cur = np.array([0, 3, -1], dtype=np.int32)
    nbr, _ = _np_weighted_hop(np.random.default_rng(0), indptr, indices,
                              gcum, cur, 4)
    assert nbr.shape == (3, 4)
    assert (nbr[2] == -1).all()
    for i, v in enumerate([0, 3]):
        valid = nbr[i][nbr[i] >= 0]
        allowed = set(indices[indptr[v]:indptr[v + 1]].tolist())
        assert set(valid.tolist()) <= allowed


def test_native_dedup_remap_matches_numpy_golden():
    """fgnn_dedup_remap (cpu_hashtable2.cc analog) is bit-identical to the
    NumPy dense-table dedup used by np_multi_layer_sample — frontier slots
    preserved, new nodes ascending, capacity clip drops remaps to -1."""
    from fgnn_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for trial in range(100):
        S = int(rng.integers(1, 40))
        f = int(rng.integers(1, 8))
        cap = S + int(rng.integers(0, 30))
        num_node = int(rng.integers(S + 5, 300))
        cur = np.full(S, -1, dtype=np.int32)
        ncur = int(rng.integers(1, S + 1))
        cur[:ncur] = rng.choice(num_node, size=ncur, replace=False)
        nbr = rng.integers(-1, num_node, size=S * f).astype(np.int32)
        nbr[rng.random(S * f) < 0.3] = -1

        new = np.unique(nbr[nbr >= 0])
        new = new[~np.isin(new, cur[cur >= 0])]
        n_new_g = min(len(new), cap - S)
        uniq_g = np.full(cap, -1, dtype=np.int32)
        uniq_g[:S] = cur
        uniq_g[S:S + n_new_g] = new[:n_new_g]
        table = np.full(num_node + 1, -1, dtype=np.int32)
        pos = np.nonzero(uniq_g >= 0)[0]
        table[uniq_g[pos]] = pos
        src_g = np.where(nbr >= 0, table[np.maximum(nbr, 0)], -1)

        uniq_n, n_new_n, src_n = native.dedup_remap(cur, nbr, cap)
        assert n_new_n == n_new_g
        assert np.array_equal(uniq_n, uniq_g)
        assert np.array_equal(src_n, src_g)
