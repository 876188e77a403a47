"""convert_ogb path exercised offline via a mocked ``ogb`` package.

The real OGB datasets need network egress; this injects a fake
``ogb.nodeproppred.NodePropPredDataset`` so the conversion, binary
write-out, and loader round-trip are tested end to end
(datagen/products.py analog).
"""
import sys
import types

import numpy as np
import pytest


@pytest.fixture
def fake_ogb(monkeypatch):
    rng = np.random.default_rng(0)
    n, e, d = 50, 200, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, 4, (n, 1)).astype(np.float64)
    labels[3, 0] = np.nan  # papers100M has NaN labels for unlabeled nodes
    ids = rng.permutation(n)

    class NodePropPredDataset:
        def __init__(self, name, root):
            assert name == "ogbn-products"
            self.graph = {
                "edge_index": np.stack([src, dst]),
                "node_feat": feat,
                "num_nodes": n,
            }
            self.labels = labels

        def get_idx_split(self):
            return {"train": ids[:30], "valid": ids[30:40],
                    "test": ids[40:50]}

        def __getitem__(self, i):
            assert i == 0
            return self.graph, self.labels

    ogb = types.ModuleType("ogb")
    nodeproppred = types.ModuleType("ogb.nodeproppred")
    nodeproppred.NodePropPredDataset = NodePropPredDataset
    ogb.nodeproppred = nodeproppred
    monkeypatch.setitem(sys.modules, "ogb", ogb)
    monkeypatch.setitem(sys.modules, "ogb.nodeproppred", nodeproppred)
    return dict(n=n, e=e, d=d)


def test_convert_ogb_roundtrip(fake_ogb, tmp_path):
    from fgnn_tpu.data.datagen import convert_ogb
    from fgnn_tpu.data.loader import load_dataset

    path = convert_ogb("ogbn-products", str(tmp_path / "raw"),
                       str(tmp_path / "out"))
    assert path is not None

    ds = load_dataset("products", root=str(tmp_path / "out"))
    assert ds.num_node == fake_ogb["n"]
    # undirected conversion doubles the edges
    assert ds.num_edge == 2 * fake_ogb["e"]
    assert ds.feat.shape == (fake_ogb["n"], fake_ogb["d"])
    assert len(ds.train_set) == 30 and len(ds.valid_set) == 10
    # NaN label became -1
    assert int(np.asarray(ds.label).min()) == -1
    # CSR is valid and alias tables were materialized for weighted sampling
    ds.validate()
    assert ds.prob_table is not None and ds.alias_table is not None

    # undirected: reverse of every edge is present
    indptr, indices = np.asarray(ds.indptr), np.asarray(ds.indices)
    adj = {(v, int(indices[j]))
           for v in range(ds.num_node)
           for j in range(indptr[v], indptr[v + 1])}
    assert all((d, s) in adj for (s, d) in adj)


def test_convert_ogb_without_package_reads_raw_layout(monkeypatch, tmp_path):
    """Without the ogb package, convert_ogb falls back to the raw csv.gz
    reader (read_ogb_raw); with no raw files present it fails loudly
    instead of silently returning None (r3: the raw path is now real —
    tests/test_ogb_convert_real.py exercises it on a vendored slice)."""
    import builtins

    real_import = builtins.__import__

    def no_ogb(name, *a, **k):
        if name.startswith("ogb"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_ogb)
    monkeypatch.delitem(sys.modules, "ogb", raising=False)
    monkeypatch.delitem(sys.modules, "ogb.nodeproppred", raising=False)
    from fgnn_tpu.data.datagen import convert_ogb

    with pytest.raises(OSError):
        convert_ogb("ogbn-products", str(tmp_path), str(tmp_path))
