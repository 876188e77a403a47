"""Figure 16a analog: test accuracy vs wall-clock training time.

Reference: exp/fig16a — accuracy-over-time curves proving FGNN's speedup
translates to faster convergence (parse_acc.py on timestamped accuracy
lines). We emit the same curve: (elapsed_s, epoch, test_acc) per
evaluation, for arch1 (one chip) and arch5 (factored).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic-nodes", type=int, default=100_000)
    p.add_argument("--num-epoch", type=int, default=8)
    p.add_argument("--archs", nargs="+", default=["arch1"])
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_cpu_collective_call_terminate_timeout_seconds=600 --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    from fgnn_tpu.config import RunArch, RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset

    ds = make_synthetic_dataset(
        num_node=args.synthetic_nodes, avg_degree=15, feat_dim=64,
        num_class=32, seed=0,
    )

    curves = {}
    for arch in args.archs:
        cfg = RunConfig(
            model="graphsage", fanout=(10, 10), batch_size=1000,
            sample_type=SampleType.KHOP0, dropout=0.5, lr=0.003,
            arch=RunArch(int(arch[4:])), num_epoch=args.num_epoch,
            num_sample_worker=2, num_train_worker=6,
        )
        if cfg.arch == RunArch.ARCH5:
            from fgnn_tpu.parallel.factored import FactoredEngine

            eng = FactoredEngine(cfg, ds)
        else:
            from fgnn_tpu.engine import OneChipEngine

            eng = OneChipEngine(cfg, ds)
        curve = []
        t0 = time.time()
        for e in range(cfg.num_epoch):
            eng.run_epoch(e)
            if hasattr(eng, "evaluate"):
                acc = eng.evaluate()
                elapsed = time.time() - t0
                curve.append({"time_s": elapsed, "epoch": e, "test_acc": acc})
                print(f"test_result:acc_curve:{arch}:{elapsed:.2f}={acc:.4f}")
        curves[arch] = curve

    with open(os.path.join(HERE, "fig16a.json"), "w") as f:
        json.dump(curves, f, indent=2)
    print(f"[exp] wrote {os.path.join(HERE, 'fig16a.json')}")


if __name__ == "__main__":
    main()
