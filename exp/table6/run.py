"""Table 6 analog: presample's init cost is small.

Reference exp/table6 (readme.md:1-60) breaks engine init into
Disk->DRAM / DRAM->GPU / topology / feature-cache / presample stages to
show presampling adds little to startup. Our columns are the init timers
the engines already emit: dataset load, cache build (host gather +
HBM upload of the hot rows), and the presample epochs themselves,
against the steady epoch time they buy.

Usage: python exp/table6/run.py [--cpu-mesh] [--synthetic-nodes N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from exp.common.runner import (cpu_mesh_meta, run_app, tunnel_meta,
                               write_json, write_table)

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic-nodes", type=int, default=1_000_000)
    p.add_argument("--num-epoch", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=2000)
    p.add_argument("--cache-percentage", type=float, default=0.2)
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()

    env = {"FGNN_TPU_FEAT_HBM_BUDGET": "0"}
    if args.cpu_mesh:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_cpu_collective_call_terminate_timeout_seconds=600 --xla_force_host_platform_device_count=8"

    base = [
        "examples/train_gnn.py", "--model", "gcn", "--arch", "arch1",
        "--dataset", "synthetic",
        "--synthetic-nodes", str(args.synthetic_nodes),
        "--num-epoch", str(args.num_epoch),
        "--batch-size", str(args.batch_size),
        "--fanout", "5", "10", "15",
        "--synthetic-skew", "6", "--synthetic-pref", "0.5",
        "--cache-percentage", str(args.cache_percentage),
        "--profile-level", "1",
    ]
    results = []
    for policy, extra in (
        ("pre_sample", ["--presample-epoch", "1"]),
        ("pre_sample_x2", ["--cache-policy", "pre_sample",
                           "--presample-epoch", "2"]),
        ("degree", []),
        ("random", []),
    ):
        cp = policy if not policy.startswith("pre_sample") else "pre_sample"
        print(f"[table6] {policy}", flush=True)
        r = run_app(base + ["--cache-policy", cp] + extra,
                    os.path.join(HERE, "run-logs"), policy, env=env)
        r.config["policy"] = policy
        results.append(r)

    meta = cpu_mesh_meta(8) if args.cpu_mesh else tunnel_meta()
    write_table(
        results,
        ["policy", "init:load_dataset", "init:copy", "init:build_cache",
         "init:presample", "init_time", "cache_hit_rate", "epoch_time",
         "epoch_time:min"],
        os.path.join(HERE, "table6.dat"), meta=meta,
    )
    write_json(results, os.path.join(HERE, "table6.json"), meta=meta)


if __name__ == "__main__":
    main()
