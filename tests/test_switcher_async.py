"""Balance switcher (arch5+switcher) and async DP engines.

Reference behaviors: balance_switcher/train_pinsage.py (epoch tail trained
by T+S GPUs) and multi_gpu/async/train_graphsage.py (no per-step gradient
all-reduce).
"""
import jax
import numpy as np
import pytest

from fgnn_tpu.config import RunConfig, SampleType


def _cfg(**kw):
    base = dict(
        model="graphsage", fanout=(4, 4), batch_size=64, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0, lr=0.01,
        num_sample_worker=2, num_train_worker=2, num_epoch=2,
    )
    base.update(kw)
    return RunConfig(**base)


def test_switcher_engine_trains(small_ds):
    from fgnn_tpu.parallel.switcher import SwitcherEngine

    eng = SwitcherEngine(_cfg(have_switcher=True), small_ds)
    assert eng.num_full == 4
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"]) and np.isfinite(r1["loss"])
    assert r1["loss"] < r0["loss"]


def test_switcher_tail_uses_full_mesh(small_ds, monkeypatch):
    """With T=1 trainer and many steps, the tail phase must actually run
    groups on the enlarged mesh (otherwise the full wave is dead code).
    Forced: on the oversubscribed virtual mesh the cost gate may
    (correctly) decline the tail."""
    monkeypatch.setenv("FGNN_TPU_SWITCHER_FORCE", "1")
    from fgnn_tpu.parallel import switcher as sw

    eng = sw.SwitcherEngine(
        _cfg(num_sample_worker=3, num_train_worker=1, batch_size=32),
        small_ds,
    )
    ran_full = []
    orig = eng._run_group

    def spy(state, group, wave, shard, group_size, key):
        if wave is eng.train_wave_full:
            ran_full.append(len(group))
        return orig(state, group, wave, shard, group_size, key)

    eng._run_group = spy
    eng.run_epoch(0)
    assert ran_full, "switcher tail never trained on the full mesh"


def test_async_engine_matches_sync_direction(small_ds):
    from fgnn_tpu.parallel.async_dp import AsyncFactoredEngine

    eng = AsyncFactoredEngine(
        _cfg(async_train=True, async_sync_every=2), small_ds
    )
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"])
    assert r1["loss"] < r0["loss"]
    # consolidated state is replica-averaged and finite
    st = eng.consolidated_state()
    flat = jax.tree.leaves(st.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # evaluate must consolidate the stacked per-worker params (fig16a's
    # async curve crashed on the leading worker axis before the override)
    acc = eng.evaluate()
    assert 0.0 <= acc <= 1.0
    # and must not clobber the stacked training state
    assert jax.tree.leaves(eng.state.params)[0].ndim == \
        jax.tree.leaves(st.params)[0].ndim + 1


def test_switcher_own_cache(small_ds):
    """switch_cache_percentage builds a second, smaller cache used by
    tail groups (DoSwitchCacheFeatureCopy analog)."""
    from fgnn_tpu.config import CachePolicy
    from fgnn_tpu.parallel.switcher import SwitcherEngine

    cfg = _cfg(have_switcher=True, switch_cache_percentage=0.1,
               cache_policy=CachePolicy.PRESAMPLE, cache_percentage=0.2)
    eng = SwitcherEngine(cfg, small_ds, feat_on_trainer=False)
    assert eng.switch_cache is not None
    assert eng.switch_cache.num_cache < eng.cache.num_cache
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"]) and r1["loss"] < r0["loss"]


def test_session_switch_init():
    import fgnn_tpu.session as sam

    sam._reset_for_tests()
    sam.config(dict(dataset="synthetic", model="graphsage", arch="arch5",
                    fanout=(4, 4), batch_size=64, num_epoch=1,
                    num_sample_worker=2, num_train_worker=2,
                    sample_type=SampleType.KHOP0))
    sam.data_init()
    sam.switch_init(0, None, 0.1)
    sam.sample_init(0)
    sam.train_init(0)
    from fgnn_tpu.parallel.switcher import SwitcherEngine

    assert isinstance(sam._session.engine, SwitcherEngine)
    r = sam._session.engine.run_epoch(0)
    assert np.isfinite(r["loss"])
    sam.shutdown()


@pytest.mark.slow
def test_async_converges_like_sync(small_ds):
    """Convergence study (VERDICT r1): async local-SGD tracks synchronous
    DP's trajectory with a small constant epoch lag (measured ~2 epochs at
    sync_every=2 on this task; e.g. acc 0.70 vs 0.84 at epoch 12, where
    async@12 ~= sync@9). Reference analog:
    multi_gpu/async/train_graphsage.py trades the per-step all-reduce for
    slightly slower per-epoch convergence."""
    from fgnn_tpu.parallel.async_dp import AsyncFactoredEngine
    from fgnn_tpu.parallel.factored import FactoredEngine

    E = 10
    sync = FactoredEngine(_cfg(num_epoch=E), small_ds)
    rs = [sync.run_epoch(e) for e in range(E)]
    asyn = AsyncFactoredEngine(
        _cfg(async_train=True, async_sync_every=2, num_epoch=E), small_ds
    )
    ra = [asyn.run_epoch(e) for e in range(E)]
    # both must actually learn
    assert rs[-1]["loss"] < 0.75 * rs[0]["loss"], rs
    assert ra[-1]["loss"] < 0.75 * ra[0]["loss"], ra
    # epoch-shifted parity: async at E matches sync ~4 epochs earlier
    best_sync_lagged = max(r["acc"] for r in rs[: E - 4])
    assert ra[-1]["acc"] > best_sync_lagged - 0.05, (
        ra[-1], best_sync_lagged
    )
    # and the loss gap stays bounded (same basin, not divergence)
    assert ra[-1]["loss"] < rs[-1]["loss"] * 1.35 + 0.05, (ra[-1], rs[-1])
