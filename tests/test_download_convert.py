"""Download+convert entry points (datagen/*.sh + papers100M.py analogs).

Zero-egress environment: the network layer is exercised via file:// URLs
and the converters via synthetic raw fixtures in the exact on-disk
layouts the real downloads produce (papers100M-bin npz zip; decoded
webgraph coo.bin).
"""
import gzip
import os

import numpy as np
import pytest

from fgnn_tpu.data import download as dl
from fgnn_tpu.data.datagen import convert_ogb
from fgnn_tpu.data.loader import load_dataset


def _make_papers_raw(base, num_node=24, feat_dim=4, num_class=5, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(base, "raw"))
    num_edge = 3 * num_node
    edge_index = rng.integers(0, num_node, size=(2, num_edge), dtype=np.int64)
    feat = rng.standard_normal((num_node, feat_dim)).astype(np.float32)
    label = rng.integers(0, num_class, size=num_node).astype(np.float64)
    label[num_node // 2:] = np.nan  # papers100M: unlabeled nodes are NaN
    np.savez(os.path.join(base, "raw", "data.npz"),
             node_feat=feat, edge_index=edge_index)
    np.savez(os.path.join(base, "raw", "node-label.npz"), node_label=label)
    split_dir = os.path.join(base, "split", "time")
    os.makedirs(split_dir)
    ids = rng.permutation(num_node // 2)
    for k, part in (("train", ids[:6]), ("valid", ids[6:9]),
                    ("test", ids[9:12])):
        with gzip.open(os.path.join(split_dir, f"{k}.csv.gz"), "wt") as f:
            f.write("\n".join(str(i) for i in part) + "\n")
    return edge_index, feat, label


def test_papers_npz_convert_roundtrip(tmp_path):
    raw_root = str(tmp_path / "raw")
    out_root = str(tmp_path / "out")
    base = os.path.join(raw_root, "papers100M-bin")
    edge_index, feat, _ = _make_papers_raw(base)

    path = convert_ogb("ogbn-papers100M", raw_root, out_root)
    assert path is not None
    ds = load_dataset("papers100M", root=out_root)
    assert ds.num_node == feat.shape[0]
    # undirected conversion doubles the edge list
    assert ds.num_edge == 2 * edge_index.shape[1]
    np.testing.assert_allclose(np.asarray(ds.feat), feat, rtol=1e-6)
    assert len(ds.train_set) == 6 and len(ds.valid_set) == 3
    # CSR is a permutation of the symmetrized COO
    src = np.repeat(np.arange(ds.num_node), np.diff(ds.indptr))
    got = set(zip(src.tolist(), np.asarray(ds.indices).tolist()))
    want = set()
    for s, t in edge_index.T.tolist():
        want.add((s, t))
        want.add((t, s))
    assert got == want


def test_webgraph_coo_convert(tmp_path, monkeypatch):
    num_node, num_edge = 30, 90
    rng = np.random.default_rng(1)
    coo = rng.integers(0, num_node, size=(num_edge, 2), dtype=np.uint32)
    spec = {
        "kind": "webgraph", "base": "toy-2010", "urls": [],
        "num_node": num_node, "feat_dim": 8, "num_class": 3,
        "splits": (5, 3, 2),
    }
    monkeypatch.setitem(dl.REGISTRY, "toy-2010", spec)
    base = tmp_path / "raw" / "toy-2010"
    base.mkdir(parents=True)
    coo.tofile(str(base / "coo.bin"))

    d = dl.convert_webgraph("toy-2010", str(tmp_path / "raw"),
                            str(tmp_path / "out"))
    ds = load_dataset("toy-2010", root=str(tmp_path / "out"))
    assert ds.num_node == num_node and ds.num_edge == num_edge
    # topology-only dataset: loader fakes features (zeros, advertised dim)
    assert ds.feat.shape[1] == 8 and not np.asarray(ds.feat).any()
    assert len(ds.train_set) == 5 and len(ds.test_set) == 2
    # splits are disjoint
    all_ids = np.concatenate([ds.train_set, ds.valid_set, ds.test_set])
    assert len(np.unique(all_ids)) == len(all_ids)
    # stored dst->src (CSC): row i holds sources of edges INTO i
    src = np.repeat(np.arange(num_node), np.diff(ds.indptr))
    got = sorted(zip(np.asarray(ds.indices).tolist(), src.tolist()))
    assert got == sorted(map(tuple, coo.tolist()))
    # cache rankings + degree toolkits ran
    assert os.path.exists(os.path.join(d, "cache_by_degree.bin"))
    assert os.path.exists(os.path.join(d, "out_degrees.bin"))


def test_fetch_file_url_and_skip(tmp_path):
    srcf = tmp_path / "payload.bin"
    srcf.write_bytes(b"x" * 1024)
    dest = str(tmp_path / "dl" / "payload.bin")
    got = dl.fetch("file://" + str(srcf), dest)
    assert open(got, "rb").read() == b"x" * 1024
    os.utime(got)  # second call must skip (no re-download)
    assert dl.fetch("file://" + str(srcf), dest) == dest


def test_fetch_unreachable_raises(tmp_path):
    with pytest.raises(RuntimeError, match="failed"):
        dl.fetch("file:///nonexistent/definitely/missing.bin",
                 str(tmp_path / "x.bin"))
