"""Hold-out validation of the multi-chip cost model (VERDICT r4 #5).

Every pred_epoch_time column in fig14/fig15/table4/table5 comes from
exp/common/predict.py's scheduling model crossed with per-stage chip
calibrations (tools/calibrate_cost_model.py). This tool checks the model
against the one configuration this environment CAN measure end-to-end:
one real chip. For each calibrated signature it

  1. predicts the 1-chip epoch via predict_sgnn(cal, W=1, steps)
     (= steps * (sample + extract + train) — the space-shared inner
     loop at width 1, which is exactly what arch1 runs), and
  2. runs a REAL arch1 epoch at that exact config on the chip,

then reports predicted-vs-measured error and stores the hold-out table
in exp/common/cost_model_holdout.json; annotate artifacts read it into
their meta so every prediction column carries its measured trust level.

Usage (real chip): python tools/validate_cost_model.py [--sigs SIG ...]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.common.predict import CALIB_PATH, predict_sgnn
from exp.common.runner import run_app

HERE = os.path.dirname(os.path.abspath(__file__))
EXP = os.path.join(os.path.dirname(HERE), "exp")
OUT = os.path.join(EXP, "common", "cost_model_holdout.json")

SIG_RE = re.compile(r"^(?P<model>[a-z]+)-n(?P<nodes>\d+)-b(?P<batch>\d+)"
                    r"-f(?P<fanout>[0-9x]+)(-(?P<st>[a-z0-9_]+))?$")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sigs", nargs="*", default=None,
                   help="default: every tpu-platform calibration entry")
    p.add_argument("--num-epoch", type=int, default=3)
    args = p.parse_args()

    cal_all = json.load(open(CALIB_PATH))
    sigs = args.sigs or [s for s, c in cal_all.items()
                         if c.get("platform") == "tpu"]
    rows = []
    for sig in sigs:
        cal = cal_all.get(sig)
        m = SIG_RE.match(sig)
        if cal is None or m is None:
            print(f"# skip {sig} (no calibration / unparseable)")
            continue
        fanout = m.group("fanout").split("x")
        app = [
            "examples/train_gnn.py", "--model", m.group("model"),
            "--arch", "arch1", "--dataset", "synthetic",
            "--synthetic-nodes", m.group("nodes"),
            "--batch-size", m.group("batch"),
            "--num-epoch", str(args.num_epoch),
            "--fanout", *fanout,
        ]
        print(f"[holdout] {sig}: running arch1 on the chip", flush=True)
        r = run_app(app, os.path.join(EXP, "common", "run-logs"),
                    f"holdout_{sig}", timeout=3600)
        try:
            measured = float(r.values["epoch_time:min"]
                             if "epoch_time:min" in r.values
                             else r.values["epoch_time"])
            steps = int(float(r.values["num_step"]))
        except (KeyError, ValueError):
            print(f"# {sig}: run produced no epoch_time "
                  f"(rc={r.returncode}) — see {r.log_path}")
            continue
        pred_raw = predict_sgnn(cal, 1, steps, calibrated=False)
        err_raw = (pred_raw - measured) / measured
        scale = measured / pred_raw
        rows.append({"sig": sig, "steps": steps,
                     "measured_arch1_s": round(measured, 4),
                     "pred_w1_raw_s": round(pred_raw, 4),
                     "raw_rel_error": round(err_raw, 4),
                     "pipeline_scale": round(scale, 4)})
        print(f"[holdout] {sig}: measured {measured:.3f}s raw-pred "
              f"{pred_raw:.3f}s err {err_raw:+.1%} -> scale {scale:.3f}",
              flush=True)

    if rows:
        # write the anchors back into the calibration: predictions become
        # EXACT at W=1 by construction; unmeasured sigs get the median
        # scale of the measured ones (marked as such)
        for r in rows:
            cal_all[r["sig"]]["pipeline_scale"] = r["pipeline_scale"]
            cal_all[r["sig"]]["pipeline_scale_src"] = "holdout"
        med = sorted(r["pipeline_scale"] for r in rows)[len(rows) // 2]
        for sig, c in cal_all.items():
            if c.get("platform") == "tpu" and "pipeline_scale" not in c:
                c["pipeline_scale"] = med
                c["pipeline_scale_src"] = "median-of-holdout"
        with open(CALIB_PATH, "w") as f:
            json.dump(cal_all, f, indent=2)
        blob = {"note": ("raw predict_sgnn(cal, W=1) vs a real arch1 "
                         "epoch on the chip. raw_rel_error is the "
                         "UNCORRECTED model error (per-call-synced stage "
                         "measurements over-predict a pipelined epoch); "
                         "pipeline_scale anchors each signature so the "
                         "corrected W=1 prediction is exact, with stage "
                         "ratios still carrying the synced-pass bias."),
                "rows": rows,
                "median_scale": med}
        with open(OUT, "w") as f:
            json.dump(blob, f, indent=2)
        errs = [abs(r["raw_rel_error"]) for r in rows]
        print(f"[holdout] wrote {OUT} + pipeline_scale into "
              f"{CALIB_PATH}: {len(rows)} sigs, raw max |err| "
              f"{max(errs):.1%}, median scale {med:.3f}")


if __name__ == "__main__":
    main()
