"""A/B the arch4 dynamic-cache prefetch pipeline vs synchronous extract.

The pipelined path overlaps batch k+1's host miss gather (split depends
only on batch k's IDS — fgnn_tpu/cache/dynamic.py) with batch k's
training, the reference's DoGPUSampleDyCache early-enqueue
(cuda_loops_arch4.cc:69-73). Equality is pinned by
tests/test_dynamic_cache.py; this probe measures the wall-clock win.

Usage:  python tools/probe_arch4_prefetch.py [--nodes N] [--epochs E]
        (run on the real chip; add --cpu for a host-only check)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=1_000_000)
    p.add_argument("--batch-size", type=int, default=8000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.engine import OneChipEngine

    os.environ["FGNN_TPU_FEAT_HBM_BUDGET"] = "0"  # host-resident features
    ds = make_synthetic_dataset(num_node=args.nodes, avg_degree=15,
                                feat_dim=128, num_class=64, seed=1,
                                neighbor_skew=6.0, neighbor_pref=0.5)

    def run(pipeline):
        cfg = RunConfig(model="graphsage", fanout=(10, 25),
                        batch_size=args.batch_size, num_hidden=256,
                        sample_type=SampleType.KHOP0, dropout=0.0,
                        num_epoch=args.epochs, pipeline=pipeline,
                        cache_policy=CachePolicy.DYNAMIC_CACHE,
                        cache_percentage=0.1)
        eng = OneChipEngine(cfg, ds)
        times, losses = [], []
        hits = []
        for e in range(args.epochs):
            st = eng.run_epoch(e)
            times.append(st["epoch_time"])
            losses.append(st["loss"])
            hits.append(eng.dyn_cache.last_num_hit)
        steady = times[1:] or times
        return float(np.median(steady)), losses, hits[-1]

    t_sync, l_sync, hit_s = run(False)
    t_pipe, l_pipe, hit_p = run(True)
    assert l_sync == l_pipe, "pipeline changed the math!"
    print(f"arch4 sync   epoch: {t_sync:.3f}s (last-step hits {hit_s})")
    print(f"arch4 prefetch epoch: {t_pipe:.3f}s (last-step hits {hit_p})")
    print(f"overlap win: {t_sync / max(t_pipe, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
