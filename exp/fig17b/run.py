"""Figure 17b analog: single-device end-to-end performance per model.

Reference exp/fig17b (README.md:1-10): DGL vs T_SOTA vs GNNLab epoch time
on one GPU across GCN/GraphSAGE/PinSAGE. DGL and T_SOTA are external
baselines (their numbers live in BASELINE.md); our single-chip system
point is the fused arch1 engine, reported per model here.

Usage: python exp/fig17b/run.py [--cpu-mesh]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from exp.common.runner import run_app, write_json, write_table

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic-nodes", type=int, default=200_000)
    p.add_argument("--num-epoch", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=8000)
    p.add_argument("--models", nargs="+",
                   default=["gcn", "graphsage", "pinsage"])
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()

    env = {}
    if args.cpu_mesh:
        env = {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_cpu_collective_call_terminate_timeout_seconds=600 --xla_force_host_platform_device_count=1",
        }
    results = []
    for model in args.models:
        base = [
            "examples/train_gnn.py", "--model", model, "--arch", "arch1",
            "--dataset", "synthetic",
            "--synthetic-nodes", str(args.synthetic_nodes),
            "--num-epoch", str(args.num_epoch),
            "--batch-size", str(args.batch_size),
        ]
        if model == "pinsage":
            base += ["--sample-type", "random_walk"]
        print(f"[fig17b] {model}", flush=True)
        r = run_app(base, os.path.join(HERE, "run-logs"), model, env=env)
        r.config["model"] = model
        results.append(r)

    write_table(
        results,
        ["model", "epoch_time", "epoch_time:min"],
        os.path.join(HERE, "fig17b.dat"),
    )
    write_json(results, os.path.join(HERE, "fig17b.json"))


if __name__ == "__main__":
    main()
