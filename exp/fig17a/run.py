"""Figure 17a analog: dynamic switching on/off for PinSAGE.

Reference exp/fig17a (README.md:1-14): one-epoch time of GNNLab training
PinSAGE with and without dynamic switching (the balance switcher) at a
fixed sampler/trainer split. PinSAGE's random-walk sampling is the
sampler-bound workload where idle-trainer recovery pays. Here: arch5
2S+6T on the CPU mesh (or pod slice), ±``--have-switcher``.

Usage: python exp/fig17a/run.py [--cpu-mesh]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from exp.common.runner import (cpu_mesh_meta, run_app, write_json,
                               write_table)

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic-nodes", type=int, default=100_000)
    # >= 8 epochs + epoch_time:min (run-to-run noise on the oversubscribed
    # CPU mesh is +/-50%, VERDICT r2 item 3) and enough steps that T-wide
    # groups actually form (25 steps at batch 2000 / train-frac 0.5)
    p.add_argument("--num-epoch", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=2000)
    p.add_argument("--train-frac", type=float, default=0.5)
    p.add_argument("--num-sample-worker", type=int, default=2)
    p.add_argument("--num-train-worker", type=int, default=6)
    p.add_argument("--switch-cache-percentage", type=float, default=0.1)
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()

    n = args.num_sample_worker + args.num_train_worker
    # default alloc scale: calibrate_caps' range margin + explicit
    # append-region sizing (ops/padding.py) cover the epoch max without
    # the old 2.5x crutch, which doubled every buffer on the mesh
    env = {}
    if args.cpu_mesh:
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_cpu_collective_call_terminate_timeout_seconds=600 --xla_force_host_platform_device_count={n}",
        })
    base = [
        "examples/train_gnn.py", "--model", "pinsage",
        "--sample-type", "random_walk",
        "--dataset", "synthetic",
        "--synthetic-nodes", str(args.synthetic_nodes),
        "--synthetic-train-frac", str(args.train_frac),
        "--num-epoch", str(args.num_epoch),
        "--batch-size", str(args.batch_size),
        "--arch", "arch5",
        "--num-sample-worker", str(args.num_sample_worker),
        "--num-train-worker", str(args.num_train_worker),
    ]
    switch_args = ["--have-switcher", "--switch-cache-percentage",
                   str(args.switch_cache_percentage)]
    results = []
    for tag, extra, xenv in (
        ("no_switch", [], {}),
        # cost-gated: declines the tail when the full mesh measures
        # slower per batch (e.g. the oversubscribed virtual CPU mesh)
        ("switch", switch_args, {}),
        # forced tail: demonstrates the S+T-mesh tail mechanics
        # regardless of the gate
        ("switch_forced", switch_args, {"FGNN_TPU_SWITCHER_FORCE": "1"}),
    ):
        print(f"[fig17a] {tag}", flush=True)
        # headline epoch time at level 1; per-stage split from a second
        # level-2 pass (stage timers sync per stage — table5 convention)
        # 90min/arm: 8-epoch pinsage runs exceed the default 30min cap
        # when the 8-device mesh is contended
        r = run_app(base + extra, os.path.join(HERE, "run-logs"), tag,
                    env={**env, **xenv}, timeout=5400)
        rp = run_app(base + extra + ["--profile-level", "2",
                                     "--num-epoch", "3"],
                     os.path.join(HERE, "run-logs"), tag + "_stages",
                     env={**env, **xenv}, timeout=5400)
        for k in ("sample_time", "copy_time", "extract_time", "train_time"):
            if rp.values.get(k):
                r.values[k] = rp.values[k]
        r.config["variant"] = tag
        results.append(r)

    meta = cpu_mesh_meta(n) if args.cpu_mesh else None
    write_table(
        results,
        ["variant", "epoch_time", "epoch_time:min", "sample_time",
         "train_time"],
        os.path.join(HERE, "fig17a.dat"), meta=meta,
    )
    write_json(results, os.path.join(HERE, "fig17a.json"), meta=meta)


if __name__ == "__main__":
    main()
