"""arch4 dynamic cache: correctness + batch-overlap hits."""
import jax.numpy as jnp
import numpy as np

from fgnn_tpu.cache.dynamic import DynamicFeatureCache


def test_dynamic_cache_correct_and_hits():
    rng = np.random.default_rng(0)
    num_node, dim, cap = 500, 8, 64
    feat = rng.standard_normal((num_node, dim)).astype(np.float32)
    cache = DynamicFeatureCache(feat, cap)

    def make_ids(ids):
        out = np.full(cap, -1, np.int32)
        out[: len(ids)] = ids
        return jnp.asarray(out)

    ids1 = rng.choice(num_node, 40, replace=False)
    out1 = np.asarray(cache.extract(make_ids(ids1)))
    for i, g in enumerate(ids1):
        np.testing.assert_allclose(out1[i], feat[g], rtol=1e-6)
    assert cache.last_num_hit == 0 and cache.last_num_miss == 40

    # second batch overlapping 20 ids with the first
    ids2 = np.concatenate([
        ids1[:20], rng.choice(
            np.setdiff1d(np.arange(num_node), ids1), 25, replace=False
        )
    ])
    out2 = np.asarray(cache.extract(make_ids(ids2)))
    for i, g in enumerate(ids2):
        np.testing.assert_allclose(out2[i], feat[g], rtol=1e-6)
    assert cache.last_num_hit == 20
    assert cache.last_num_miss == 25


def test_dyncache_pipelined_bit_identical(small_ds, monkeypatch):
    """arch4 prefetch pipeline (miss gather of batch k+1 under train of
    batch k) is a SCHEDULING change: losses and final params must equal
    the synchronous extract path exactly."""
    import jax
    from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
    from fgnn_tpu.engine import OneChipEngine

    monkeypatch.setenv("FGNN_TPU_FEAT_HBM_BUDGET", "0")

    def run(pipeline):
        cfg = RunConfig(model="graphsage", fanout=(3, 5), batch_size=64,
                        num_hidden=32, sample_type=SampleType.KHOP0,
                        dropout=0.0, num_epoch=2, pipeline=pipeline,
                        cache_policy=CachePolicy.DYNAMIC_CACHE,
                        cache_percentage=0.1)
        eng = OneChipEngine(cfg, small_ds)
        assert eng.dyn_cache is not None
        stats = [eng.run_epoch(e) for e in range(2)]
        return stats, jax.tree.map(np.asarray, eng.state.params)

    s_pipe, p_pipe = run(True)
    s_sync, p_sync = run(False)
    for a, b in zip(s_pipe, s_sync):
        assert a["loss"] == b["loss"], (a, b)
    jax.tree.map(np.testing.assert_array_equal, p_pipe, p_sync)
