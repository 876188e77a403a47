"""Dataset format round-trip: write reference binary layout, mmap-load it."""
import numpy as np

from fgnn_tpu.data import load_dataset, make_synthetic_dataset, write_dataset
from fgnn_tpu.data.synthetic import build_alias_tables


def test_roundtrip(tmp_path):
    ds = make_synthetic_dataset(num_node=500, avg_degree=5, feat_dim=8,
                                num_class=3, seed=1)
    build_alias_tables(ds, seed=1)
    write_dataset(ds, str(tmp_path))
    ds2 = load_dataset(ds.name, root=str(tmp_path))

    assert ds2.num_node == ds.num_node
    assert ds2.num_edge == ds.num_edge
    assert ds2.num_class == ds.num_class
    np.testing.assert_array_equal(np.asarray(ds2.indptr), ds.indptr)
    np.testing.assert_array_equal(np.asarray(ds2.indices), ds.indices)
    np.testing.assert_allclose(np.asarray(ds2.feat), ds.feat)
    np.testing.assert_array_equal(np.asarray(ds2.label), ds.label)
    np.testing.assert_array_equal(ds2.train_set, ds.train_set)
    np.testing.assert_allclose(np.asarray(ds2.prob_table), ds.prob_table)
    np.testing.assert_array_equal(np.asarray(ds2.alias_table), ds.alias_table)


def test_alias_table_distribution():
    """Alias method must reproduce the weight distribution."""
    ds = make_synthetic_dataset(num_node=50, avg_degree=6, feat_dim=4,
                                num_class=2, seed=3)
    build_alias_tables(ds, seed=3)
    # pick a vertex with degree >= 3 and simulate draws host-side
    deg = np.diff(ds.indptr)
    v = int(np.argmax(deg))
    off, end = int(ds.indptr[v]), int(ds.indptr[v + 1])
    d = end - off
    rng = np.random.default_rng(0)
    n_draw = 20000
    slots = rng.integers(0, d, n_draw)
    coins = rng.random(n_draw)
    take_alias = coins >= ds.prob_table[off + slots]
    final = np.where(take_alias, ds.alias_table[off + slots], slots)
    counts = np.bincount(final, minlength=d)
    # expected proportional to the weights implied by prefix table
    prefix = ds.prob_prefix_table[off:end]
    w = np.diff(np.concatenate([[0.0], prefix]))
    expect = w / w.sum() * n_draw
    assert np.all(np.abs(counts - expect) < 6 * np.sqrt(expect + 1)), (
        counts, expect
    )


def test_write_64(tmp_path):
    """32to64.cc analog: uint64 copies of topology + splits round-trip."""
    import os

    import numpy as np

    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.data.datagen import write_64
    from fgnn_tpu.data.synthetic import write_dataset

    ds = make_synthetic_dataset(num_node=500, avg_degree=5, feat_dim=8,
                                num_class=4, seed=0)
    path = write_dataset(ds, str(tmp_path))
    write_64(ds, path)
    ind64 = np.fromfile(os.path.join(path, "indices64.bin"), dtype=np.uint64)
    assert np.array_equal(ind64, np.asarray(ds.indices).astype(np.uint64))
    ptr64 = np.fromfile(os.path.join(path, "indptr64.bin"), dtype=np.uint64)
    assert np.array_equal(ptr64, np.asarray(ds.indptr).astype(np.uint64))


def test_synthetic_pref_correlates_degree_with_access():
    """neighbor_pref maps hot targets through the out-degree ranking so a
    degree-based cache ranking captures real access share (fig12 regime)."""
    import numpy as np
    from fgnn_tpu.data import make_synthetic_dataset

    ds0 = make_synthetic_dataset(num_node=20_000, avg_degree=10, feat_dim=4,
                                 num_class=4, seed=3, neighbor_skew=6.0,
                                 neighbor_pref=0.0)
    ds1 = make_synthetic_dataset(num_node=20_000, avg_degree=10, feat_dim=4,
                                 num_class=4, seed=3, neighbor_skew=6.0,
                                 neighbor_pref=0.5)

    def degree_hit(ds, pct=0.2):
        deg = np.asarray(ds.indptr[1:]) - np.asarray(ds.indptr[:-1])
        hot = np.zeros(ds.num_node, bool)
        hot[np.argsort(-deg)[: int(ds.num_node * pct)]] = True
        return float(hot[np.asarray(ds.indices)].mean())

    # without pref, in-access popularity is independent of out-degree
    assert degree_hit(ds0) < 0.3
    # with pref=0.5, half the edge mass rides the degree ranking
    assert degree_hit(ds1) > 0.45
    ds1.validate()


def test_empty_feat_is_explicit():
    """A short feature matrix is corrupt data unless Dataset.empty_feat is
    set (ADVICE r2: the reference gates GPUMockExtract behind an explicit
    SAMGRAPH_EMPTY_FEAT env, engine.cc:138-155)."""
    import dataclasses

    import pytest

    from fgnn_tpu.cache.manager import FeatureCache
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.ops.extract import host_gather

    ds = make_synthetic_dataset(num_node=5000, avg_degree=8, feat_dim=8,
                                num_class=4, seed=0, empty_feat_rows=256)
    assert ds.empty_feat and ds.feat_mod == 256

    # truncated-without-flag is rejected at validate and at cache build
    bad = dataclasses.replace(ds, empty_feat=False)
    with pytest.raises(ValueError, match="truncated|rows"):
        bad.validate()
    rank = np.arange(ds.num_node, dtype=np.int32)
    with pytest.raises(ValueError, match="empty_feat"):
        FeatureCache(ds.feat, rank, 0.1, ds.num_node)

    # flagged mock: cache build + host gather both apply modulo (no
    # IndexError, rows match feat[id % mod])
    fc = FeatureCache(ds.feat, rank, 0.1, ds.num_node, empty_feat=True)
    assert fc._mod == 256
    ids = np.array([0, 300, 4999, -1], np.int32)
    out = host_gather(ds.feat, ids, mod=ds.feat_mod)
    np.testing.assert_allclose(out[1], ds.feat[300 % 256])
    np.testing.assert_allclose(out[3], 0)


def test_graph_properties_checker():
    """toolkit/property analog: the vectorized property report matches a
    hand-built graph (reference graph_property.cc checks)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.dataset_info import graph_properties

    # 4 nodes: 0->1, 0->1 (dup), 1->0 (reverse of 0->1), 1->1 (self),
    # 2->0 (sorted row), node 3 zero-degree; row 0 unsorted? [1,1] ok.
    indptr = np.array([0, 2, 4, 5, 5], np.int64)
    indices = np.array([1, 1, 0, 1, 0], np.int32)
    p = graph_properties(indptr, indices, 4)
    assert p["self_loops"] == 1
    assert p["zero_degree_nodes"] == 1
    assert p["duplicate_edges"] == 1       # the second 0->1
    # multiplicity-aware reverse pairing (advisor r4): the TWO 0->1
    # copies can pair with only ONE 1->0 => min(2,1)=1, plus 1->0's
    # pairing with 0->1 (1) and the self-loop (1); 2->0 has no 0->2
    assert p["reverse_edges"] == 3
    assert not p["is_undirected"]
    assert p["indices_sorted"]

    # unsorted row detected
    p2 = graph_properties(np.array([0, 2, 2], np.int64),
                          np.array([1, 0], np.int32), 2)
    assert not p2["indices_sorted"]

    # fully undirected triangle
    ip = np.array([0, 2, 4, 6], np.int64)
    ix = np.array([1, 2, 0, 2, 0, 1], np.int32)
    p3 = graph_properties(ip, ix, 3)
    assert p3["is_undirected"] and p3["reverse_edges"] == 6
    assert p3["duplicate_edges"] == 0 and p3["self_loops"] == 0
