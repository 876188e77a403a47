"""Curated one-command sweep suites (example/auto_runner analog).

The reference ships ~4K LoC of LogTable configs (run_samgraph.py,
run_sgnn.py, ...) that pin down which (app x dataset x knob) grid each
paper table needs. Here each SUITE is a function returning
``(tag, extra_args, extra_env)`` rows over the shared app
(examples/train_gnn.py); results parse through exp/common/runner into a
``.dat`` table + ``.json`` like every other exp artifact.

Usage:
    python exp/auto_runner.py <suite> [--cpu-mesh] [--synthetic-nodes N]
    python exp/auto_runner.py --list
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.common.runner import run_app, write_json, write_table

HERE = os.path.dirname(os.path.abspath(__file__))
MODELS = ["gcn", "graphsage", "pinsage"]


def _model_args(model):
    if model == "pinsage":
        return ["--model", "pinsage", "--sample-type", "random_walk"]
    return ["--model", model]


def suite_breakdown(args):
    """run_samgraph.py breakdown_test analog: per-stage Sample/Copy/Train
    split for every app (single chip, arch1, profile_level 2)."""
    rows = []
    for m in MODELS:
        rows.append((m, _model_args(m) + ["--arch", "arch1",
                                          "--profile-level", "2"], {}))
    cols = ["model", "sample_time", "copy_time", "extract_time",
            "train_time", "epoch_time"]
    return rows, cols


def suite_cache(args):
    """Cache-percentage sweep (run_sgnn.py overall_perf analog): hit rate
    + epoch time vs cache size, presample policy, host-resident feats."""
    rows = []
    for pct in (0.0, 0.1, 0.2, 0.3):
        extra = ["--arch", "arch1", "--model", "graphsage",
                 "--profile-level", "1"]
        if pct > 0:
            extra += ["--cache-policy", "pre_sample",
                      "--cache-percentage", str(pct)]
        rows.append((f"cache{int(pct * 100):02d}", extra,
                     {"FGNN_TPU_FEAT_HBM_BUDGET": "0"}))
    cols = ["cache_percentage", "cache_hit_rate", "epoch_time"]
    return rows, cols


def suite_scalability(args):
    """Sampler:trainer ratio sweep (table5-shaped, run_samgraph.py
    scalability_test analog) on the factored engine."""
    rows = []
    for s, t in ((1, 7), (2, 6), (3, 5), (4, 4)):
        rows.append((
            f"{s}S_{t}T",
            ["--arch", "arch5", "--model", "graphsage",
             "--num-sample-worker", str(s), "--num-train-worker", str(t),
             "--profile-level", "2"],
            {},
        ))
    cols = ["num_sample_worker", "num_train_worker", "sample_time",
            "train_time", "epoch_time"]
    return rows, cols


def suite_arch_matrix(args):
    """Every arch x graphsage, one config — smoke + relative timing."""
    rows = []
    for arch in ("arch0", "arch1", "arch2", "arch5", "arch6"):
        extra = ["--arch", arch, "--model", "graphsage"]
        env = {}
        if arch == "arch2":
            extra += ["--cache-policy", "pre_sample",
                      "--cache-percentage", "0.2"]
            env = {"FGNN_TPU_FEAT_HBM_BUDGET": "0"}
        if arch in ("arch5", "arch6"):
            extra += ["--num-sample-worker", "2", "--num-train-worker", "2"]
        rows.append((arch, extra, env))
    cols = ["arch", "epoch_time", "init_time"]
    return rows, cols


SUITES = {
    "breakdown": suite_breakdown,
    "cache": suite_cache,
    "scalability": suite_scalability,
    "arch_matrix": suite_arch_matrix,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("suite", nargs="?", choices=sorted(SUITES))
    p.add_argument("--list", action="store_true")
    p.add_argument("--synthetic-nodes", type=int, default=200_000)
    p.add_argument("--num-epoch", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8000)
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()
    if args.list or not args.suite:
        for k, fn in sorted(SUITES.items()):
            print(f"{k:14s} {fn.__doc__.splitlines()[0]}")
        return

    rows, cols = SUITES[args.suite](args)
    base = [
        "examples/train_gnn.py", "--dataset", "synthetic",
        "--synthetic-nodes", str(args.synthetic_nodes),
        "--num-epoch", str(args.num_epoch),
        "--batch-size", str(args.batch_size),
        "--fanout", "5", "10", "15",
    ]
    env = {}
    if args.cpu_mesh:
        env = {"JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": "--xla_cpu_collective_call_terminate_timeout_seconds=600 --xla_force_host_platform_device_count=8"}
    out_dir = os.path.join(HERE, "auto", args.suite)
    results = []
    for tag, extra, extra_env in rows:
        print(f"[auto:{args.suite}] {tag}", flush=True)
        r = run_app(base + extra, os.path.join(out_dir, "run-logs"), tag,
                    env={**env, **extra_env})
        for c in cols:  # expose config:<c> under the bare column name
            r.config.setdefault(c, r.config.get(f"config:{c}", tag))
        results.append(r)
    write_table(results, cols, os.path.join(out_dir, f"{args.suite}.dat"))
    write_json(results, os.path.join(out_dir, f"{args.suite}.json"))
    print(f"[auto:{args.suite}] wrote {out_dir}/{args.suite}.dat")


if __name__ == "__main__":
    main()
