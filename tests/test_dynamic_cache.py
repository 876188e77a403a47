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
