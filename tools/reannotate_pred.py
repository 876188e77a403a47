"""Refill pred_epoch_time columns of an existing exp artifact.

The --cpu-mesh artifact runs are expensive (tens of minutes each on the
oversubscribed mesh); when a chip calibration lands AFTER the mesh run
(tools/calibrate_cost_model.py), this re-annotates the saved
.json/.dat pair in place instead of re-running the mesh.

Usage: python tools/reannotate_pred.py table4 [table5 fig14 fig15]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.common.predict import (MODEL_SAMPLE_TYPE, annotate_prediction,
                                config_sig)
from exp.common.runner import RunResult, write_json, write_table

EXP = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "exp")


def _strict_sig(c):
    """Signature from a saved run config — no silent defaults.

    The runners record synthetic_nodes and sample_type since round 5; an
    artifact missing them (or a model outside the shared map) returns
    None and its rows keep pred_epoch_time = X with a visible warning,
    rather than being annotated against a guessed calibration.
    """
    missing = [k for k in ("model", "synthetic_nodes", "batch_size")
               if k not in c]
    if missing:
        print(f"#   skip row (config missing {missing}): re-run the exp "
              "runner to record them", flush=True)
        return None
    st = c.get("sample_type") or MODEL_SAMPLE_TYPE.get(c["model"])
    if st is None:
        print(f"#   skip row (unknown model {c['model']!r})", flush=True)
        return None
    return config_sig(c["model"], int(c["synthetic_nodes"]),
                      int(c["batch_size"]), (5, 10, 15), st)


# artifact -> displayed columns (sig comes from _strict_sig for all)
SPECS = {
    "table4": ["model", "run_arch", "num_step", "epoch_time", "sample_time",
               "copy_time", "extract_time", "train_time", "init_time",
               "pred_epoch_time"],
    "table5": ["split", "num_step", "epoch_time", "epoch_time:min",
               "sample_time", "copy_time", "extract_time", "train_time",
               "pred_epoch_time"],
    "fig14": ["system", "workers", "num_step", "epoch_time",
              "epoch_time:min", "pred_epoch_time"],
    "fig15": ["split", "num_step", "sample_time", "copy_time", "train_time",
              "epoch_time", "pred_epoch_time"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("artifacts", nargs="+", choices=sorted(SPECS))
    args = p.parse_args()

    for name in args.artifacts:
        cols = SPECS[name]
        path = os.path.join(EXP, name, f"{name}.json")
        with open(path) as f:
            blob = json.load(f)
        results = [RunResult(config=r["config"], values=r["values"],
                             returncode=r.get("rc", 0), log_path="")
                   for r in blob["results"]]
        # group by signature (table4 mixes models)
        by_sig = {}
        for r in results:
            r.values.pop("pred_epoch_time", None)
            sig = _strict_sig(r.config)
            if sig is None:
                continue
            by_sig.setdefault(sig, []).append(r)
        for sig, rs in by_sig.items():
            annotate_prediction(rs, sig)
            filled = sum(1 for r in rs
                         if r.values.get("pred_epoch_time", "X") != "X")
            print(f"[{name}] {sig}: {filled}/{len(rs)} predictions filled")
        meta = blob.get("meta")
        write_table(results, cols,
                    os.path.join(EXP, name, f"{name}.dat"), meta=meta)
        write_json(results, path, meta=meta)


if __name__ == "__main__":
    main()
