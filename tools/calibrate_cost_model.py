"""Calibrate the multi-chip cost model on the ONE real chip.

Times the three pipeline stages (sample / extract / train) of a config at
its exact artifact shape and writes ``exp/common/chip_calibration.json``
keyed by the config signature (exp/common/predict.py). Scaling artifacts
(fig14/fig15/table4/table5) then report predicted multi-chip epoch times
from these REAL single-chip stage costs instead of oversubscribed
virtual-mesh wall-clock (round-3 verdict item 3).

Usage (on the real chip):
    python tools/calibrate_cost_model.py --model gcn --nodes 100000 \
        --batch-size 4000 --fanout 5 10 15
    python tools/calibrate_cost_model.py --preset exp   # all exp configs
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# exp configs that produce multi-chip artifacts (keep in sync with the
# runners' defaults)
EXP_PRESETS = [
    dict(model="gcn", nodes=100_000, batch_size=4000, fanout=(5, 10, 15),
         sample_type="khop2"),                      # fig14 / fig15
    dict(model="gcn", nodes=200_000, batch_size=8000, fanout=(5, 10, 15),
         sample_type="khop2"),                      # table4 / table5 (chip)
    dict(model="graphsage", nodes=200_000, batch_size=8000,
         fanout=(5, 10, 15), sample_type="khop0"),  # table4 (chip)
    dict(model="pinsage", nodes=200_000, batch_size=8000, fanout=(5, 10, 15),
         sample_type="random_walk"),                # table4 / fig17a (chip)
    # the --cpu-mesh artifact shape is batch 2000 (table4/table5 runners)
    dict(model="gcn", nodes=200_000, batch_size=2000, fanout=(5, 10, 15),
         sample_type="khop2"),                      # table4 cpu-mesh
    dict(model="graphsage", nodes=200_000, batch_size=2000,
         fanout=(5, 10, 15), sample_type="khop0"),  # table4/5 cpu-mesh
    dict(model="pinsage", nodes=200_000, batch_size=2000, fanout=(5, 10, 15),
         sample_type="random_walk"),                # table4 cpu-mesh
    dict(model="pinsage", nodes=100_000, batch_size=2000, fanout=(5, 10, 15),
         sample_type="random_walk"),                # fig17a
]


def calibrate_one(model, nodes, batch_size, fanout, sample_type, reps=5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.engine import OneChipEngine
    from fgnn_tpu.utils import Timer, force_done

    ds = make_synthetic_dataset(num_node=nodes, avg_degree=15, feat_dim=128,
                                num_class=64, seed=0)
    cfg = RunConfig(model=model, fanout=tuple(fanout),
                    batch_size=batch_size, num_hidden=256,
                    sample_type=SampleType(sample_type), dropout=0.0)
    eng = OneChipEngine(cfg, ds)
    seeds, n, _ = next(eng.shuffler.batches(0))
    key = jax.random.key(0)
    seeds_d = jnp.asarray(seeds)

    def timed(fn, *a, force=None, reps=reps):
        out = fn(*a)
        force_done(force(out) if force else out)
        best = float("inf")
        for _ in range(reps):
            t = Timer()
            out = fn(*a)
            force_done(force(out) if force else out)
            best = min(best, t.passed())
        return out, best * 1e3

    batch, sample_ms = timed(
        lambda: eng.sample_jit(key, seeds_d, jnp.int32(n)),
        force=lambda b: b.num_input)
    if eng.feat_on_device:
        feats, extract_ms = timed(
            lambda: eng._gather_g(eng.feat_dev, batch.input_nodes))
    else:
        def ext():
            idx = eng.cache.get_miss_cache_index(batch.input_nodes)
            m, _ = eng.cache.upload_miss(idx)
            return eng.cache.combine(idx, m)
        feats, extract_ms = timed(ext)
    # train step cost WITHOUT donating eng.state (copy per reps)
    def tr():
        st = jax.tree.map(jnp.copy, eng.state)
        st2, loss, acc = eng.train_jit(st, key, batch, feats)
        return loss
    _, train_ms = timed(tr)
    wave_mb = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(batch)) / 2**20
    steps = eng.shuffler.num_step
    return dict(sample_ms=sample_ms, extract_ms=extract_ms,
                train_ms=train_ms, wave_mb=wave_mb, steps_1chip=steps,
                platform=jax.devices()[0].platform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gcn")
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=4000)
    p.add_argument("--fanout", nargs="+", type=int, default=[5, 10, 15])
    p.add_argument("--sample-type", default="khop2")
    p.add_argument("--preset", choices=["exp"], default=None)
    p.add_argument("--missing-only", action="store_true",
                   help="skip presets that already have a chip calibration")
    p.add_argument("--cpu", action="store_true",
                   help="host-only smoke (NOT a valid calibration)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from exp.common.predict import CALIB_PATH, config_sig

    todo = (EXP_PRESETS if args.preset else
            [dict(model=args.model, nodes=args.nodes,
                  batch_size=args.batch_size, fanout=tuple(args.fanout),
                  sample_type=args.sample_type)])
    data = {}
    if os.path.exists(CALIB_PATH):
        data = json.load(open(CALIB_PATH))
    for c in todo:
        sig = config_sig(c["model"], c["nodes"], c["batch_size"],
                         c["fanout"], c["sample_type"])
        if args.missing_only and data.get(sig, {}).get("platform") == "tpu":
            print(f"[calibrate] {sig} already calibrated, skipping",
                  flush=True)
            continue
        print(f"[calibrate] {sig}", flush=True)
        cal = calibrate_one(**c)
        print(f"[calibrate]   {cal}", flush=True)
        data[sig] = cal
    with open(CALIB_PATH, "w") as f:
        json.dump(data, f, indent=2)
    print(f"[calibrate] wrote {CALIB_PATH}")


if __name__ == "__main__":
    main()
