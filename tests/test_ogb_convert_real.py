"""Real OGB convert path on non-mock input (VERDICT r2 item 6).

The environment has zero egress (the products.zip download attempt fails
at DNS resolution — see read_ogb_raw docstring) and no ``ogb`` package,
so this exercises the REAL converter against a vendored micro-slice in
OGB's exact extracted raw layout (edge.csv.gz / node-feat.csv.gz /
node-label.csv.gz / split/sales_ranking/*.csv.gz, products-shaped:
100-dim feats, 47 classes). Reference: datagen/products.py.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "ogb_raw")


def test_convert_ogb_raw_and_train_with_accuracy(tmp_path):
    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.data.datagen import convert_ogb
    from fgnn_tpu.data.loader import load_dataset
    from fgnn_tpu.engine import OneChipEngine

    out = convert_ogb("ogbn-products", FIXTURE, str(tmp_path))
    assert out is not None and os.path.exists(os.path.join(out, "meta.txt"))

    ds = load_dataset("products", root=str(tmp_path))
    # num_class inferred as label.max()+1 (not every one of the 47
    # product classes appears in a 300-node slice)
    assert ds.num_node == 300 and 40 <= ds.num_class <= 47
    assert ds.feat.shape == (300, 100)
    # undirected conversion doubled the edges (datagen/products.py)
    assert ds.num_edge == 2 * 1930
    # splits survived the roundtrip
    assert len(ds.train_set) == 180 and len(ds.test_set) == 80

    # CSR symmetric: every (u,v) has (v,u)
    indptr, idx = np.asarray(ds.indptr), np.asarray(ds.indices)
    u = 5
    for v in idx[indptr[u]:indptr[u + 1]][:5]:
        back = idx[indptr[v]:indptr[v + 1]]
        assert u in back

    # one real training run with reported accuracy on the converted data
    cfg = RunConfig(model="graphsage", fanout=(5, 5), batch_size=64,
                    num_hidden=64, sample_type=SampleType.KHOP0,
                    dropout=0.0, lr=0.01)
    eng = OneChipEngine(cfg, ds)
    losses = [eng.run_epoch(e)["loss"] for e in range(8)]
    acc = eng.evaluate()
    assert losses[-1] < losses[0], losses
    assert acc > 1.5 / 47, f"test acc {acc:.3f} not above chance"
    print(f"converted-products micro: loss {losses[0]:.3f}->{losses[-1]:.3f} "
          f"test_acc={acc:.3f}")
