"""Attribute the out-of-program per-epoch residual (round-3 verdict #1).

Round-3: 32 steps x 37.8ms in-program = 1.21s but the bench epoch
measured 1.35s — ~140ms/epoch of dispatch/stats/seed-upload overhead was
unattributed. This probe measures each candidate on the real chip:

  A  sequential run_epoch x3 (the old bench loop: per-epoch stats fetch
     + synchronous seed upload)
  B  run_epochs(1,3) (pipelined dispatch, one fetch, prefetched seeds)
  C  stats-fetch RTT alone (fetch a 4-float device vector)
  D  seed upload alone (device_put of one epoch's [steps, cap] seeds)

Usage (real chip):  python tools/probe_epoch_overhead.py
                    [--nodes N] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=1_000_000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.engine import OneChipEngine
    from fgnn_tpu.utils import Timer

    ds = make_synthetic_dataset(num_node=args.nodes, avg_degree=15,
                                feat_dim=128, num_class=64, seed=1)
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5, lr=0.003)
    eng = OneChipEngine(cfg, ds)
    eng.run_epoch(0)  # warmup/compile

    # A: old bench loop
    t = Timer()
    for e in range(1, 4):
        eng.run_epoch(e)
    a = t.passed() / 3

    # B: pipelined dispatch
    t = Timer()
    eng.run_epochs(4, 3)
    b = t.passed() / 3

    # C: stats fetch RTT (fetch a tiny device vector produced by a
    # trivial program — measures sync + transfer latency, not compute)
    v = jnp.zeros((4,)) + 1.0
    _ = np.asarray(v)
    t = Timer()
    for _ in range(5):
        v = v + 1.0
        _ = np.asarray(v)
    c = t.passed() / 5

    # D: one epoch's seed upload
    seeds_all, nums_all = eng.shuffler.epoch_arrays(9)
    t = Timer()
    for _ in range(3):
        d1 = jax.device_put(seeds_all)
        d2 = jax.device_put(nums_all)
        _ = np.asarray(d2[:1])  # force completion
    d = t.passed() / 3
    mb = seeds_all.nbytes / 2**20

    print(f"A sequential run_epoch:   {a:.4f} s/epoch")
    print(f"B pipelined run_epochs:   {b:.4f} s/epoch  "
          f"({(a - b) * 1e3:.0f} ms/epoch recovered, {a / b:.3f}x)")
    print(f"C stats-fetch RTT:        {c * 1e3:.1f} ms")
    print(f"D seed upload ({mb:.2f} MB): {d * 1e3:.1f} ms")
    print(f"attribution: A-B = {(a - b) * 1e3:.0f} ms vs C+D = "
          f"{(c + d) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
