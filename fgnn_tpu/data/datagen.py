"""Dataset conversion tooling.

Analog of the reference's ``datagen/`` (papers100M.py, products.py) +
``utility/data-process`` converters: turn common raw graph formats into
the framework's binary layout (meta.txt + .bin). Since this environment
has no network egress, converters work from already-downloaded raw files:

  * OGB node-property datasets (ogbn-products/papers100M) via the `ogb`
    package if importable, else from the extracted npz/csv layout.
  * Plain COO edge lists (``coo_to_dataset`` analog).

Also provides the cache-ranking generators (cache_by_degree/random) and
the weighted-sampling table builders (create_alias_table /
create_prob_prefix_table analogs) as CLI-callable functions.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .. import constants
from ..utils import get_logger
from .schema import Dataset
from .synthetic import build_alias_tables, write_dataset

log = get_logger(__name__)


def coo_to_csr(
    src: np.ndarray, dst: np.ndarray, num_node: int
) -> Tuple[np.ndarray, np.ndarray]:
    """COO -> CSR (coo_to_dataset.cc analog): edges grouped by src."""
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    indptr = np.zeros(num_node + 1, dtype=np.int64)
    counts = np.bincount(src_s, minlength=num_node)
    np.cumsum(counts, out=indptr[1:])
    return indptr, dst_s.astype(np.int32)


def from_coo(
    name: str,
    src: np.ndarray,
    dst: np.ndarray,
    feat: np.ndarray,
    label: np.ndarray,
    train_set: np.ndarray,
    test_set: np.ndarray,
    valid_set: np.ndarray,
    num_class: Optional[int] = None,
) -> Dataset:
    num_node = feat.shape[0]
    indptr, indices = coo_to_csr(
        np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64),
        num_node,
    )
    ds = Dataset(
        name=name,
        num_node=num_node,
        num_edge=len(indices),
        num_class=int(num_class if num_class is not None else label.max() + 1),
        indptr=indptr,
        indices=indices,
        feat=np.asarray(feat, dtype=np.float32),
        label=np.asarray(label, dtype=np.int32),
        train_set=np.asarray(train_set, dtype=np.int32),
        test_set=np.asarray(test_set, dtype=np.int32),
        valid_set=np.asarray(valid_set, dtype=np.int32),
    )
    ds.validate()
    return ds


#: split-directory name inside each OGB dataset (ogb master.csv
#: ``split`` column; datagen/products.py downloads the same layout)
OGB_SPLIT_DIR = {
    "ogbn-products": "sales_ranking",
    "ogbn-papers100M": "time",
    "ogbn-arxiv": "time",
}


def read_ogb_raw(name: str, ogb_root: str):
    """Read OGB's extracted raw csv.gz layout directly (no ``ogb``
    package needed — it is not installed in this environment and the
    download mirrors are unreachable; documented attempt 2026-08-18:
    DNS resolution fails, zero egress).

    Layout inside e.g. products.zip (what NodePropPredDataset's
    library-agnostic loader reads):

      <root>/<dir>/raw/edge.csv.gz            src,dst per line
      <root>/<dir>/raw/num-node-list.csv.gz
      <root>/<dir>/raw/node-feat.csv.gz       one row of floats per node
      <root>/<dir>/raw/node-label.csv.gz      one int per node
      <root>/<dir>/split/<split>/train.csv.gz / valid.csv.gz / test.csv.gz

    Returns (edge_index [2,E], node_feat [N,D] f32, labels [N], split dict).
    """
    d = name.replace("-", "_")
    base = os.path.join(ogb_root, d)
    for cand in (name, name.split("-", 1)[-1] + "-bin", name.split("-", 1)[-1]):
        if not os.path.isdir(base):  # all layouts seen in the wild
            base = os.path.join(ogb_root, cand)
    raw = os.path.join(base, "raw")
    if os.path.exists(os.path.join(raw, "data.npz")):
        # papers100M ships npz, not csv.gz (datagen/papers100M.py:49-65)
        from .download import read_ogb_npz

        return read_ogb_npz(base)

    def csv(path, dtype):
        return np.loadtxt(path, delimiter=",", dtype=dtype, ndmin=2)

    num_node = int(csv(os.path.join(raw, "num-node-list.csv.gz"),
                       np.int64)[0, 0])
    edges = csv(os.path.join(raw, "edge.csv.gz"), np.int64)
    feat = csv(os.path.join(raw, "node-feat.csv.gz"), np.float32)
    label = csv(os.path.join(raw, "node-label.csv.gz"), np.float64)
    assert feat.shape[0] == num_node, (feat.shape, num_node)
    split_dir = os.path.join(base, "split", OGB_SPLIT_DIR.get(name, "time"))
    split = {
        k: csv(os.path.join(split_dir, f"{k}.csv.gz"), np.int64).reshape(-1)
        for k in ("train", "valid", "test")
    }
    return edges.T, feat, label.reshape(-1), split


def convert_ogb(name: str, ogb_root: str, out_root: str,
                add_reverse: bool = True) -> Optional[str]:
    """OGB -> binary layout (datagen/products.py / papers100M.py analog).

    Uses the ``ogb`` package when importable, else reads the extracted
    raw csv.gz layout directly (read_ogb_raw) — data must already be
    under ``ogb_root`` (no egress in this environment; the download
    attempt fails at DNS).
    """
    try:
        from ogb.nodeproppred import NodePropPredDataset

        data = NodePropPredDataset(name=name, root=ogb_root)
        split = data.get_idx_split()
        graph, labels = data[0]
        edge_index, node_feat = graph["edge_index"], graph["node_feat"]
        labels = labels.reshape(-1)
    except ImportError:
        log.info("ogb package unavailable; reading raw csv.gz layout")
        edge_index, node_feat, labels, split = read_ogb_raw(name, ogb_root)
    src, dst = edge_index
    if add_reverse:  # reference converts to undirected (products.py)
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    short = {"ogbn-products": "products",
             "ogbn-papers100M": "papers100M"}.get(name, name)
    ds = from_coo(
        short, src, dst, node_feat,
        np.nan_to_num(np.asarray(labels, np.float64),
                      nan=-1).astype(np.int64),
        split["train"], split["test"], split["valid"],
    )
    path = write_dataset(ds, out_root)
    write_cache_rankings(ds, path)
    build_alias_tables(ds)
    write_dataset(ds, out_root)
    return path


def write_cache_rankings(ds: Dataset, path: str, seed: int = 0) -> None:
    """cache_by_{degree,random,degree_hop,heuristic}.bin generators
    (utility/data-process/toolkit/cache/*.cc analogs)."""
    from ..cache.policy import (
        rank_by_degree,
        rank_by_degree_hop,
        rank_by_heuristic,
        rank_random,
    )

    def w(fname, arr):
        np.ascontiguousarray(arr.view(np.uint32)).tofile(
            os.path.join(path, fname)
        )

    w(constants.CACHE_BY_DEGREE_FILE, rank_by_degree(ds))
    w(constants.CACHE_BY_DEGREE_HOP_FILE, rank_by_degree_hop(ds))
    w(constants.CACHE_BY_HEURISTIC_FILE, rank_by_heuristic(ds))
    w(constants.CACHE_BY_RANDOM_FILE, rank_random(ds, seed))


def write_64(ds: Dataset, path: str) -> None:
    """indptr64/indices64/{train,test,valid}_set64.bin — uint64 copies of
    the topology + splits for frameworks that index in 64-bit
    (toolkit/generator/32to64.cc analog)."""
    def w64(fname, arr):
        np.ascontiguousarray(
            np.asarray(arr).astype(np.uint64)
        ).tofile(os.path.join(path, fname))

    w64("indptr64.bin", ds.indptr)
    w64("indices64.bin", ds.indices)
    w64("train_set64.bin", ds.train_set)
    w64("test_set64.bin", ds.test_set)
    w64("valid_set64.bin", ds.valid_set)


def write_degrees(ds: Dataset, path: str) -> None:
    """in_degrees.bin / out_degrees.bin (toolkit/degree analog)."""
    out_deg = np.diff(ds.indptr).astype(np.uint32)
    in_deg = np.bincount(
        np.asarray(ds.indices), minlength=ds.num_node
    ).astype(np.uint32)
    out_deg.tofile(os.path.join(path, constants.OUT_DEGREE_FILE))
    in_deg.tofile(os.path.join(path, constants.IN_DEGREE_FILE))


def main():
    import argparse

    p = argparse.ArgumentParser("fgnn_tpu datagen")
    p.add_argument("command", choices=["ogb", "synthetic", "rankings",
                                       "to64", "download",
                                       "convert-webgraph"])
    p.add_argument("--name", default="ogbn-products")
    p.add_argument("--ogb-root", default="/graph-learning/data-raw")
    p.add_argument("--out-root", default=constants.DEFAULT_DATASET_ROOT)
    p.add_argument("--num-nodes", type=int, default=1_000_000)
    args = p.parse_args()
    if args.command == "ogb":
        print(convert_ogb(args.name, args.ogb_root, args.out_root))
    elif args.command == "download":
        from .download import REGISTRY, convert_webgraph, download

        base = download(args.name, args.ogb_root)
        if REGISTRY[args.name]["kind"] == "ogb-zip":
            print(convert_ogb(args.name, args.ogb_root, args.out_root))
        elif os.path.exists(os.path.join(base, "coo.bin")):
            print(convert_webgraph(args.name, args.ogb_root, args.out_root))
        else:
            print(base)  # BV decode pending (see download.py docstring)
    elif args.command == "convert-webgraph":
        from .download import convert_webgraph

        print(convert_webgraph(args.name, args.ogb_root, args.out_root))
    elif args.command == "synthetic":
        from .synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(num_node=args.num_nodes, avg_degree=15,
                                    feat_dim=128, num_class=64)
        build_alias_tables(ds)
        path = write_dataset(ds, args.out_root)
        write_cache_rankings(ds, path)
        write_degrees(ds, path)
        print(path)
    elif args.command == "rankings":
        from .loader import load_dataset

        ds = load_dataset(args.name, root=args.out_root)
        path = os.path.join(args.out_root, args.name)
        write_cache_rankings(ds, path)
        write_degrees(ds, path)
        print(path)
    elif args.command == "to64":
        from .loader import load_dataset

        ds = load_dataset(args.name, root=args.out_root)
        path = os.path.join(args.out_root, args.name)
        write_64(ds, path)
        print(path)


if __name__ == "__main__":
    main()
