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
    p.add_argument("--repeats", type=int, default=1,
                   help="re-run each config N times and take per-column "
                        "MIN of init:* timings: a one-shot device_put "
                        "over the tunnel has measured 54x spread on "
                        "identical placements (round-4 table6), so "
                        "single-shot init columns are noise-dominated")
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
        reps = []
        for i in range(max(1, args.repeats)):
            print(f"[table6] {policy} (rep {i + 1}/{args.repeats})",
                  flush=True)
            tag = policy if args.repeats == 1 else f"{policy}_rep{i}"
            reps.append(run_app(base + ["--cache-policy", cp] + extra,
                                os.path.join(HERE, "run-logs"), tag,
                                env=env))
        r = reps[0]
        if len(reps) > 1:
            # min over repeats for every init/time column: one-shot
            # transfers over the tunnel have huge spread; min is the
            # cleanest estimator of the actual placement cost
            for k in list(r.values):
                if k.startswith("init") or k.startswith("epoch_time"):
                    try:
                        r.values[k] = f"{min(float(x.values[k]) for x in reps if k in x.values):.4f}"
                    except (ValueError, TypeError):
                        pass
        r.config["policy"] = policy
        r.config["repeats"] = args.repeats
        results.append(r)

    meta = dict(cpu_mesh_meta(8) if args.cpu_mesh else tunnel_meta())
    meta["init_columns"] = (
        f"min of {args.repeats} repeat(s); single-shot tunnel transfers "
        "have measured 54x spread on identical placements — treat "
        "init:copy as a tunnel artifact, not a policy property"
    )
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
