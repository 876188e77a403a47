"""Real-dataset accuracy regression on the vendored products fixture
(VERDICT r4 #8 / missing #3).

Trains the converted ogbn-products micro-slice (tests/fixtures/ogb_raw,
OGB's exact raw csv.gz layout; reference datagen/products.py) to plateau
and PINS the plateau test accuracy for arch1 and arch5, plus a bound on
the async variant's gap vs sync (VERDICT r4 weak #5 — fig16a shows async
plateauing ~2.2 points under sync; the staleness-one gradient is the
expected cause, and this test bounds the same effect at fixture scale).

The fixture is 300 nodes / 180 train; the model overfits (train loss
-> 0.002) and the test plateau is ~0.11 — far above the 47-class chance
rate of 0.021 and DETERMINISTIC given the epoch-seeded shuffle, so the
band below is a real regression tripwire for the whole
convert -> load -> sample -> train -> evaluate path.
"""
import os

import numpy as np
import pytest

from fgnn_tpu.config import RunConfig, SampleType

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "ogb_raw")

PLATEAU_LO, PLATEAU_HI = 0.05, 0.20   # measured arch1 plateau 0.109
ASYNC_GAP_MAX = 0.08                  # absolute accuracy points vs sync


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from fgnn_tpu.data.datagen import convert_ogb
    from fgnn_tpu.data.loader import load_dataset

    tmp = str(tmp_path_factory.mktemp("products"))
    convert_ogb("ogbn-products", FIXTURE, tmp)
    return load_dataset("products", root=tmp)


def base_cfg(**kw):
    kw.setdefault("model", "graphsage")
    kw.setdefault("fanout", (5, 5))
    kw.setdefault("batch_size", 64)
    kw.setdefault("num_hidden", 64)
    kw.setdefault("sample_type", SampleType.KHOP0)
    kw.setdefault("dropout", 0.0)
    kw.setdefault("lr", 0.01)
    return RunConfig(**kw)


@pytest.mark.slow
def test_arch1_plateau_accuracy(ds):
    from fgnn_tpu.engine import OneChipEngine

    eng = OneChipEngine(base_cfg(), ds)
    for e in range(30):
        r = eng.run_epoch(e)
    acc = float(eng.evaluate())
    assert r["loss"] < 0.05, f"did not converge: loss {r['loss']}"
    assert PLATEAU_LO <= acc <= PLATEAU_HI, f"arch1 plateau acc {acc:.3f}"


@pytest.mark.mesh
@pytest.mark.slow
def test_arch5_plateau_accuracy_and_async_gap(ds):
    import jax

    from fgnn_tpu.parallel.async_dp import AsyncFactoredEngine
    from fgnn_tpu.parallel.factored import FactoredEngine

    devices = jax.devices()[:2]
    cfg = base_cfg(num_sample_worker=1, num_train_worker=1)
    sync = FactoredEngine(cfg, ds, devices=devices)
    for e in range(30):
        sync.run_epoch(e)
    acc_sync = float(sync.evaluate())
    assert PLATEAU_LO <= acc_sync <= PLATEAU_HI, (
        f"arch5 plateau acc {acc_sync:.3f}"
    )

    # async variant: staleness-one gradients — plateau may sit below
    # sync (reference fig16a behavior) but must stay within the bound
    an = AsyncFactoredEngine(cfg, ds, devices=devices)
    for e in range(30):
        an.run_epoch(e)
    acc_async = float(an.evaluate())
    assert acc_sync - acc_async <= ASYNC_GAP_MAX, (
        f"async plateau {acc_async:.3f} more than {ASYNC_GAP_MAX} below "
        f"sync {acc_sync:.3f}"
    )
