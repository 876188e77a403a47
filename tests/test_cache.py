"""Feature cache manager + presample policy + cached engine path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.cache.manager import FeatureCache
from fgnn_tpu.config import CachePolicy, RunConfig, SampleType


def test_miss_cache_split_and_combine():
    rng = np.random.default_rng(0)
    num_node, dim = 200, 8
    feat = rng.standard_normal((num_node, dim)).astype(np.float32)
    ranking = rng.permutation(num_node).astype(np.int32)
    cache = FeatureCache(feat, ranking, cache_percentage=0.3, num_node=num_node)

    ids = np.concatenate([
        rng.choice(num_node, 40, replace=False),
        np.full(8, -1, dtype=np.int64),
    ]).astype(np.int32)
    index = cache.get_miss_cache_index(jnp.asarray(ids))
    num_miss = int(index.num_miss)
    num_hit = int(index.num_hit)
    assert num_miss + num_hit == 40
    # hit flags correct
    cached_set = set(int(x) for x in ranking[: cache.num_cache])
    for i, g in enumerate(ids):
        if g < 0:
            continue
        assert bool(index.hit[i]) == (int(g) in cached_set)

    miss = cache.host_extract_miss(np.asarray(index.miss_ids), num_miss)
    out = np.asarray(cache.combine(index, jnp.asarray(miss)))
    for i, g in enumerate(ids):
        if g >= 0:
            np.testing.assert_allclose(out[i], feat[g], rtol=1e-6)


def test_upload_miss_bucketed_matches_full_cap():
    """upload_miss H2Ds a power-of-2 BUCKET of miss rows, not the cap;
    combine must produce the same features either way (papers100M's
    cache-mode epoch was 80x cap-padded upload before this)."""
    rng = np.random.default_rng(1)
    num_node, dim = 50_000, 8
    feat = rng.standard_normal((num_node, dim)).astype(np.float32)
    ranking = rng.permutation(num_node).astype(np.int32)
    cache = FeatureCache(feat, ranking, cache_percentage=0.5,
                         num_node=num_node)

    # id cap far above the bucket floor, few real ids -> bucket < cap
    ids = np.full(5000, -1, dtype=np.int32)
    real = rng.choice(num_node, 300, replace=False).astype(np.int32)
    ids[:300] = real
    index = cache.get_miss_cache_index(jnp.asarray(ids))
    assert int(index.miss_ids.shape[0]) > 1024  # bucketing engages

    miss_t, num_miss = cache.upload_miss(index)
    assert miss_t.shape[0] == 1024  # floor bucket, not the 5000 cap
    assert num_miss <= 1024
    out = np.asarray(cache.combine(index, miss_t))

    full = cache.host_extract_miss(np.asarray(index.miss_ids), num_miss)
    ref = np.asarray(cache.combine(index, jnp.asarray(full)))
    np.testing.assert_array_equal(out, ref)
    for i, g in enumerate(ids):
        if g >= 0:
            np.testing.assert_allclose(out[i], feat[g], rtol=1e-6)


def test_cache_zero_and_full():
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((50, 4)).astype(np.float32)
    ranking = np.arange(50, dtype=np.int32)
    for pct in (0.0, 1.0):
        cache = FeatureCache(feat, ranking, pct, 50)
        ids = jnp.asarray(np.array([3, 10, -1], dtype=np.int32))
        index = cache.get_miss_cache_index(ids)
        miss = cache.host_extract_miss(
            np.asarray(index.miss_ids), int(index.num_miss)
        )
        out = np.asarray(cache.combine(index, jnp.asarray(miss)))
        np.testing.assert_allclose(out[0], feat[3], rtol=1e-6)
        np.testing.assert_allclose(out[2], 0.0)


def test_one_chip_engine_cached_host_path(small_ds):
    """OneChipEngine with host-resident features + presample cache."""
    from fgnn_tpu.engine import OneChipEngine
    from fgnn_tpu.utils.profiler import Profiler

    Profiler.reset()
    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=128, num_hidden=32,
        sample_type=SampleType.KHOP0, dropout=0.0,
        cache_policy=CachePolicy.PRESAMPLE, cache_percentage=0.25,
        presample_epoch=1,
    )
    eng = OneChipEngine(cfg, small_ds, feat_hbm_budget=0)  # force host feats
    assert eng.cache is not None and not eng.feat_on_device
    s = eng.run_epoch(0)
    assert np.isfinite(s["loss"])
    from fgnn_tpu.utils.profiler import Profiler

    prof = Profiler.get()
    fb = prof.get_epoch_value(0, "epoch_feature_bytes")
    mb = prof.get_epoch_value(0, "epoch_miss_bytes")
    assert fb > 0 and mb < fb  # some hits happened
