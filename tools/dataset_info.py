"""Dataset inspection / validation CLI.

Analog of the reference's utility/data-process toolkit/{property,degree,
train_graph_size} binaries: CSR validity check, degree statistics, and
per-hop sampled-subgraph size estimates.

Usage: python tools/dataset_info.py <name> [--root PATH] [--fanout 25 10]
       python tools/dataset_info.py synthetic --num-nodes 100000
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser("fgnn_tpu dataset info")
    p.add_argument("name")
    p.add_argument("--root", default=None)
    p.add_argument("--num-nodes", type=int, default=100_000)
    p.add_argument("--fanout", nargs="+", type=int, default=[25, 10])
    p.add_argument("--batch-size", type=int, default=8000)
    args = p.parse_args()

    from fgnn_tpu.data import load_dataset, make_synthetic_dataset

    if args.name == "synthetic":
        ds = make_synthetic_dataset(num_node=args.num_nodes, avg_degree=15,
                                    feat_dim=128, num_class=64)
    else:
        ds = load_dataset(args.name, root=args.root)

    indptr = np.asarray(ds.indptr)
    indices = np.asarray(ds.indices)
    deg = np.diff(indptr)

    # --- property check (toolkit/property csr checker) -------------------
    ok = True
    if indptr[0] != 0 or indptr[-1] != len(indices):
        print("FAIL: indptr endpoints inconsistent"); ok = False
    if (np.diff(indptr) < 0).any():
        print("FAIL: indptr not monotone"); ok = False
    if len(indices) and (indices.max() >= ds.num_node or indices.min() < 0):
        print("FAIL: indices out of range"); ok = False
    for name, arr in (("train", ds.train_set), ("test", ds.test_set),
                      ("valid", ds.valid_set)):
        a = np.asarray(arr)
        if len(a) and (a.max() >= ds.num_node or a.min() < 0):
            print(f"FAIL: {name}_set out of range"); ok = False
    print(f"csr_check={'OK' if ok else 'FAIL'}")

    # --- degree stats (toolkit/degree) -----------------------------------
    print(f"num_node={ds.num_node} num_edge={ds.num_edge} "
          f"feat_dim={ds.feat_dim} num_class={ds.num_class}")
    print(f"train/test/valid={len(np.asarray(ds.train_set))}/"
          f"{len(np.asarray(ds.test_set))}/{len(np.asarray(ds.valid_set))}")
    qs = np.percentile(deg, [0, 50, 90, 99, 100]).astype(int)
    print(f"out_degree min/p50/p90/p99/max={'/'.join(map(str, qs))} "
          f"mean={deg.mean():.2f}")

    # --- sampled size estimate (toolkit/train_graph_size) ----------------
    from fgnn_tpu.ops.reference_impl import calibrate_caps

    caps = calibrate_caps(
        indptr, indices, np.asarray(ds.train_set), args.batch_size,
        list(reversed(args.fanout)), num_probe=3, seed=0,
    )
    print(f"calibrated (cumulative, new) unique caps per hop "
          f"(batch {args.batch_size}, fanout {args.fanout}): {caps}")
    feat_bytes_per_batch = caps[-1][0] * ds.feat_dim * 4
    print(f"est feature bytes/batch={feat_bytes_per_batch/1e6:.1f}MB")


if __name__ == "__main__":
    main()
