"""Jitted-sampler vs NumPy-calibrator cross-check (VERDICT r4 weak #6).

``calibrate_caps`` sizes every static buffer from NumPy probe batches
(ops/reference_impl.py), but the epoch runs the JITTED sampler
(ops/sampling.py). If the two ever drift — a pick-count bug, a dedup
difference, a tier misclassification — caps would be sized for the wrong
sampler and batches would silently clip. These tests run REAL jitted
batches through plans calibrated by the NumPy model and assert no
overflow and in-cap counts, across the sampler families and the tiered
layout.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(num_node=8000, avg_degree=14, feat_dim=16,
                                  num_class=4, seed=5, neighbor_skew=4.0)


@pytest.mark.fast
@pytest.mark.parametrize("sample_type,model", [
    (SampleType.KHOP0, "graphsage"),    # tiered fast path
    (SampleType.KHOP2, "gcn"),          # dedup path (out-degrees)
    (SampleType.KHOP1, "graphsage"),    # with replacement
])
def test_jit_batches_fit_numpy_calibrated_caps(ds, sample_type, model):
    cfg = RunConfig(model=model, fanout=(15, 10), batch_size=256,
                    num_hidden=16, sample_type=sample_type, dropout=0.0)
    eng = OneChipEngine(cfg, ds)
    plan = eng.plan
    dedup = not (eng.feat_on_device and model != "gcn")
    for seeds, n, _ in eng.shuffler.batches(0):
        batch = jax.jit(
            lambda s, n_: eng._sample(eng.graph, jax.random.key(1), s, n_,
                                      dedup_last_hop=dedup)
        )(jnp.asarray(seeds), jnp.int32(n))
        assert not bool(batch.overflowed), (
            f"jit batch overflowed NumPy-calibrated caps: {plan}"
        )
        assert int(batch.num_input) <= batch.input_nodes.shape[0]
        for blk, cap in zip(batch.blocks, reversed(plan.num_input_cap)):
            assert int(blk.num_dst) <= cap


@pytest.mark.fast
def test_tier_cap_fits_real_frontier(ds):
    """The tier-A cap (count of deg>fB frontier vertices) sized from
    NumPy probes must hold for every jitted epoch batch."""
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=256,
                    num_hidden=16, sample_type=SampleType.KHOP2,
                    dropout=0.0)
    eng = OneChipEngine(cfg, ds)
    if eng.plan.tier_a_cap is None:
        pytest.skip("tier did not engage at this shape")
    for e in range(2):
        r = eng.run_epoch(e)
        assert np.isfinite(r["loss"])
    from fgnn_tpu.utils.profiler import Profiler

    for e in range(2):
        assert Profiler.get().get_epoch_value(e, "epoch_cap_overflow") == 0.0
