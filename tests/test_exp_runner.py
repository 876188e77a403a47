"""exp harness log parsing (common_parser.py analog)."""
from exp.common.runner import parse_log


def test_parse_log():
    text = """
config:model=graphsage
config:arch=arch5
Epoch 00001 | Time 1.0
test_result:epoch_time=1.2345
test_result:cache_hit_rate=0.98
noise line
"""
    out = parse_log(text)
    assert out["config:model"] == "graphsage"
    assert out["config:arch"] == "arch5"
    assert out["epoch_time"] == "1.2345"
    assert out["cache_hit_rate"] == "0.98"


def test_cost_model_predictions():
    """Multi-chip predictions from single-chip stage costs follow the
    arch5/arch6 scheduling model, and CPU smoke calibrations are refused
    (they would launder host timings into 'predicted chip' columns)."""
    import json

    from exp.common.predict import (load_calibration, predict_fgnn,
                                    predict_sgnn)

    cal = {"sample_ms": 10.0, "extract_ms": 5.0, "train_ms": 15.0,
           "wave_mb": 1.0}
    # 100 steps, 2S+6T: sampler wall 50*10=500ms, trainer 17*20=340ms
    # -> sampler-bound
    t = predict_fgnn(cal, S=2, T=6, steps=100, ici_gbps=1e9)
    assert abs(t - 0.5) < 0.01, t
    # trainer-bound at 1S+... no: S=5 -> 20*10=200 < 17*20=340
    t2 = predict_fgnn(cal, S=5, T=6, steps=100, ici_gbps=1e9)
    assert abs(t2 - 0.34) < 0.01, t2
    # SGNN: all stages serial per worker
    t3 = predict_sgnn(cal, W=8, steps=100)
    assert abs(t3 - 13 * 0.030) < 1e-6, t3

    # cpu-platform calibration refused
    import os, tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cal.json")
        json.dump({"sig": {**cal, "platform": "cpu"}}, open(p, "w"))
        assert load_calibration("sig", p) is None
        json.dump({"sig": {**cal, "platform": "axon"}}, open(p, "w"))
        assert load_calibration("sig", p) is not None
