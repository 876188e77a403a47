"""Single-chip-calibrated cost model for multi-chip artifacts.

Multi-chip hardware is unavailable in this environment; the virtual CPU
mesh validates sharding *semantics* but its wall-clocks anti-scale
(8 virtual devices share fewer physical cores). Scaling artifacts
(fig14/fig15/table4/table5) therefore report, next to the labeled
oversubscribed wall-clock, a PREDICTED epoch time derived from
measurements taken on the one real chip:

    sample_ms   one batch through the fused sampler program
    extract_ms  one batch's feature extraction (gather / cache merge)
    train_ms    one fwd+bwd+adam step
    wave_mb     size of one padded batch pytree (the queue transfer)

crossed with the reference's scheduling model (dist_loops_arch5/6.cc):

    FGNN (S samplers + T trainers, steps batches/epoch):
        sampler wall = ceil(steps/S) * sample_ms
        trainer wall = ceil(steps/T) * (extract_ms + train_ms)
        epoch = max(sampler, trainer) + wave_mb/ici     (pipelined stages)
    SGNN (W space-shared workers):
        epoch = ceil(steps/W) * (sample_ms + extract_ms + train_ms)

Calibration JSON is produced on the real chip by
``tools/calibrate_cost_model.py`` and keyed by a config signature; when
no matching calibration exists the prediction columns read "X" rather
than inventing numbers.
"""
from __future__ import annotations

import json
import math
import os
from typing import Dict, Optional

HERE = os.path.dirname(os.path.abspath(__file__))
CALIB_PATH = os.path.join(HERE, "chip_calibration.json")

# canonical model -> default sample type, shared by the training app
# (examples/train_gnn.py) and every exp runner/annotator so calibration
# signatures can never drift from what the app actually ran
MODEL_SAMPLE_TYPE = {
    "gcn": "khop2",
    "graphsage": "khop0",
    "pinsage": "random_walk",
    "gat": "khop2",
}

# v5e ICI ~ 1.6 Tbps/link => ~200 GB/s usable per direction; the wave
# transfer is a rounding error next to stage times at these shapes, but
# carry it so large waves are not silently free.
DEFAULT_ICI_GBPS = 100.0


def config_sig(model: str, num_node: int, batch_size: int,
               fanout, sample_type: str = "") -> str:
    fo = "x".join(str(f) for f in fanout)
    return f"{model}-n{num_node}-b{batch_size}-f{fo}" + (
        f"-{sample_type}" if sample_type else "")


def load_calibration(sig: str, path: str = CALIB_PATH) -> Optional[Dict]:
    if not os.path.exists(path):
        return None
    data = json.load(open(path))
    cal = data.get(sig)
    if cal is not None and cal.get("platform") == "cpu" and not os.environ.get(
        "FGNN_TPU_ALLOW_CPU_CALIBRATION"
    ):
        # a --cpu smoke calibration would launder host timings into
        # "predicted chip" columns — refuse it
        return None
    return cal


def predict_fgnn(cal: Dict, S: int, T: int, steps: int,
                 ici_gbps: float = DEFAULT_ICI_GBPS) -> float:
    """Predicted arch5 epoch seconds on real chips.

    ``pipeline_scale`` (tools/validate_cost_model.py hold-out) anchors
    the per-call-synced stage measurements to a REAL pipelined arch1
    epoch: without it the raw stage sums over-predict 2-3x (each
    calibration call pays a tunnel sync the pipelined epoch does not).
    Stage RATIOS still come from the synced pass — a known bias the
    hold-out cannot remove with one anchor equation.
    """
    ps = cal.get("pipeline_scale", 1.0)
    sampler = math.ceil(steps / S) * cal["sample_ms"] * ps
    trainer = math.ceil(steps / T) * (
        cal["extract_ms"] + cal["train_ms"]) * ps
    transfer = steps * cal.get("wave_mb", 0.0) / (ici_gbps * 1e3) * 1e3  # ms
    return (max(sampler, trainer) + min(transfer, sampler + trainer)) / 1e3


def predict_sgnn(cal: Dict, W: int, steps: int,
                 calibrated: bool = True) -> float:
    """Predicted arch6 epoch seconds on real chips (see predict_fgnn
    for pipeline_scale; pass calibrated=False for the RAW stage sum —
    the hold-out uses that to measure the uncorrected model error)."""
    ps = cal.get("pipeline_scale", 1.0) if calibrated else 1.0
    per = (cal["sample_ms"] + cal["extract_ms"] + cal["train_ms"]) * ps
    return math.ceil(steps / W) * per / 1e3


def annotate_prediction(results, sig: str, steps_key: str = "num_step"):
    """Add pred_epoch_time to each RunResult (values dict) when a chip
    calibration for this config exists. Each result's config must carry
    'system'/'arch' + worker counts; steps come from the run's own log."""
    cal = load_calibration(sig)
    for r in results:
        steps = int(float(r.values.get(steps_key, 0) or 0))
        if cal is None or steps <= 0:
            r.values.setdefault("pred_epoch_time", "X")
            continue
        arch = r.config.get("arch", r.config.get("system", ""))
        S = int(r.config.get("num_sample_worker", 1) or 1)
        T = int(r.config.get("num_train_worker", 1) or 1)
        if "6" in str(arch) or arch == "sgnn":
            pred = predict_sgnn(cal, T, steps)
        else:
            pred = predict_fgnn(cal, S, T, steps)
        r.values["pred_epoch_time"] = f"{pred:.4f}"
    return results
