"""Dataset download + convert entry points.

Reference analogs: datagen/papers100M.py, datagen/products.py,
datagen/twitter.sh, datagen/uk-2006-05.sh — each downloads a public
dataset into a raw directory and converts it to the binary meta.txt+.bin
layout that ``data.loader`` mmaps.

This environment has zero egress (documented attempt 2026-08-18: DNS
resolution fails), so the network path cannot be exercised here; the
converters below it ARE exercised, against vendored fixtures
(tests/test_ogb_convert_real.py, tests/test_download_convert.py). On a
machine with egress:

    python -m fgnn_tpu.data.datagen download --name ogbn-products
    python -m fgnn_tpu.data.datagen download --name ogbn-papers100M
    python -m fgnn_tpu.data.datagen download --name twitter        # + decode
    python -m fgnn_tpu.data.datagen download --name uk-2006-05     # + decode

The two webgraph datasets (twitter-2010, uk-2006-05) ship BV-compressed
adjacency (.graph/.properties). Decoding BV needs the upstream webgraph
jar (the reference runs it in twitter.sh:25-27); we stop at the download
and consume the decoder's ``coo.bin`` output (interleaved uint32
src,dst pairs) via :func:`convert_webgraph` — same division of labor as
the reference, whose WebgraphDecoder is likewise an external Java tool.
"""
import gzip
import os
import zipfile

import numpy as np

from .. import constants
from ..utils.logging import get_logger

log = get_logger(__name__)

#: name -> download spec. URLs are the reference's own sources
#: (papers100M.py:23, products.py, twitter.sh:10-12, uk-2006-05.sh:10-12).
REGISTRY = {
    "ogbn-papers100M": {
        "kind": "ogb-zip",
        "url": "http://snap.stanford.edu/ogb/data/nodeproppred/papers100M-bin.zip",
        "dir": "papers100M-bin",
    },
    "ogbn-products": {
        "kind": "ogb-zip",
        "url": "http://snap.stanford.edu/ogb/data/nodeproppred/products.zip",
        "dir": "products",
    },
    "twitter": {
        "kind": "webgraph",
        "base": "twitter-2010",
        "urls": [
            "http://data.law.di.unimi.it/webdata/twitter-2010/twitter-2010.graph",
            "http://data.law.di.unimi.it/webdata/twitter-2010/twitter-2010.properties",
        ],
        # twitter/uk ship topology only; the reference fabricates
        # feat/class/split sizes in its meta (twitter.sh:37-45)
        "num_node": 41_652_230,
        "feat_dim": 256,
        "num_class": 150,
        "splits": (416_500, 100_000, 200_000),
    },
    "uk-2006-05": {
        "kind": "webgraph",
        "base": "uk-2006-05",
        "urls": [
            "http://data.law.di.unimi.it/webdata/uk-2006-05/uk-2006-05.graph",
            "http://data.law.di.unimi.it/webdata/uk-2006-05/uk-2006-05.properties",
        ],
        "num_node": 77_741_046,
        "feat_dim": 256,
        "num_class": 150,
        "splits": (1_000_000, 200_000, 100_000),
    },
}


def fetch(url: str, dest: str, chunk: int = 1 << 22) -> str:
    """Stream one URL to ``dest`` (skip if present)."""
    if os.path.exists(dest) and os.path.getsize(dest) > 0:
        log.info("already downloaded: %s", dest)
        return dest
    import urllib.error
    import urllib.request

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    log.info("fetching %s", url)
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                buf = r.read(chunk)
                if not buf:
                    break
                f.write(buf)
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"download of {url} failed ({e}); this environment may have no "
            f"egress — fetch the file out-of-band into {dest} and re-run"
        ) from e
    os.replace(tmp, dest)
    return dest


def download(name: str, raw_root: str) -> str:
    """Download (and unzip) one dataset's raw files; returns the raw dir."""
    spec = REGISTRY[name]
    if spec["kind"] == "ogb-zip":
        base = os.path.join(raw_root, spec["dir"])
        zpath = os.path.join(raw_root, os.path.basename(spec["url"]))
        if not os.path.isdir(base):
            fetch(spec["url"], zpath)
            log.info("unzipping %s", zpath)
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw_root)
        return base
    base = os.path.join(raw_root, spec["base"])
    for url in spec["urls"]:
        fetch(url, os.path.join(base, os.path.basename(url)))
    if not os.path.exists(os.path.join(base, "coo.bin")):
        log.warning(
            "BV-compressed graph downloaded; decode it with the upstream "
            "webgraph tool into %s/coo.bin (uint32 src,dst pairs), then run "
            "datagen convert-webgraph --name %s", base, name)
    return base


def read_ogb_npz(base: str):
    """papers100M-bin raw layout (datagen/papers100M.py:49-65 analog):
    raw/data.npz {node_feat, edge_index}, raw/node-label.npz {node_label},
    split/time/{train,valid,test}.csv.gz.

    Returns (edge_index [2,E], feat [N,D] f32, label [N], split dict) —
    the same tuple as :func:`datagen.read_ogb_raw`.
    """
    raw = os.path.join(base, "raw")
    data = np.load(os.path.join(raw, "data.npz"))
    labels = np.load(os.path.join(raw, "node-label.npz"))
    feat = np.asarray(data["node_feat"], dtype=np.float32)
    edge_index = np.asarray(data["edge_index"], dtype=np.int64)
    label = np.asarray(labels["node_label"], dtype=np.float64).reshape(-1)

    def split_csv(k):
        with gzip.open(os.path.join(base, "split", "time", f"{k}.csv.gz"),
                       "rt") as f:
            return np.loadtxt(f, dtype=np.int64, ndmin=1)

    split = {k: split_csv(k) for k in ("train", "valid", "test")}
    return edge_index, feat, label, split


def convert_webgraph(name: str, raw_root: str, out_root: str,
                     seed: int = 0) -> str:
    """coo.bin (decoded webgraph) -> binary dataset layout.

    Like the reference (twitter.sh:34-45 + coo_to_dataset.cc), the graph
    is topology-only: meta advertises FEAT_DIM/NUM_CLASS but no feat.bin
    is written — the loader's empty-feat mode (engine.cc:138-155 analog)
    substitutes a fake table. Splits are disjoint uniform draws of the
    reference's advertised sizes. Edges are stored dst->src (CSC of the
    directed graph) so sampling walks IN-neighbors, matching
    papers100M.py:68-71.
    """
    from .datagen import coo_to_csr, write_64, write_cache_rankings, write_degrees

    spec = REGISTRY[name]
    base = os.path.join(raw_root, spec["base"])
    coo = np.memmap(os.path.join(base, "coo.bin"), dtype=np.uint32,
                    mode="r").reshape(-1, 2)
    num_node = spec["num_node"]
    indptr, indices = coo_to_csr(
        coo[:, 1].astype(np.int64), coo[:, 0].astype(np.int64), num_node)

    n_train, n_valid, n_test = spec["splits"]
    rng = np.random.default_rng(seed)
    picks = rng.choice(num_node, size=n_train + n_valid + n_test,
                       replace=False).astype(np.uint32)
    label = rng.integers(0, spec["num_class"], size=num_node,
                         dtype=np.uint64)

    d = os.path.join(out_root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, constants.META_FILE), "w") as f:
        f.write(f"{constants.META_NUM_NODE} {num_node}\n")
        f.write(f"{constants.META_NUM_EDGE} {len(indices)}\n")
        f.write(f"{constants.META_FEAT_DIM} {spec['feat_dim']}\n")
        f.write(f"{constants.META_NUM_CLASS} {spec['num_class']}\n")
        f.write(f"{constants.META_NUM_TRAIN_SET} {n_train}\n")
        f.write(f"{constants.META_NUM_TEST_SET} {n_test}\n")
        f.write(f"{constants.META_NUM_VALID_SET} {n_valid}\n")
    indptr.astype(np.uint32).tofile(os.path.join(d, constants.INDPTR_FILE))
    indices.view(np.uint32).tofile(os.path.join(d, constants.INDICES_FILE))
    label.tofile(os.path.join(d, constants.LABEL_FILE))
    picks[:n_train].tofile(os.path.join(d, constants.TRAIN_SET_FILE))
    picks[n_train:n_train + n_valid].tofile(
        os.path.join(d, constants.VALID_SET_FILE))
    picks[n_train + n_valid:].tofile(os.path.join(d, constants.TEST_SET_FILE))

    from .loader import load_dataset

    ds = load_dataset(name, root=out_root, empty_feat=20)
    write_cache_rankings(ds, d)
    write_degrees(ds, d)
    if len(indices) >= (1 << 31):  # uk-union-scale consumers index in 64-bit
        write_64(ds, d)
    return d
