"""PRESAMPLE_STATIC all-neighbor counting (DoGPUSampleAllNeighbour)."""
import numpy as np

from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine


def test_presample_static_engine():
    ds = make_synthetic_dataset(num_node=3000, avg_degree=10, feat_dim=32,
                                num_class=4, seed=7, neighbor_skew=6.0)
    cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=128,
                    num_hidden=32, sample_type=SampleType.KHOP0,
                    dropout=0.0, lr=0.01,
                    cache_policy=CachePolicy.PRESAMPLE_STATIC,
                    cache_percentage=0.2)
    eng = OneChipEngine(cfg, ds, feat_hbm_budget=0)
    assert eng.cache is not None
    r0 = eng.run_epoch(0)
    r1 = eng.run_epoch(1)
    assert np.isfinite(r0["loss"]) and r1["loss"] < r0["loss"]


def test_static_ranking_counts_all_neighbors():
    """A node that is every frontier node's neighbor must rank hot even if
    the sampler happens not to pick it."""
    import jax
    import jax.numpy as jnp

    from fgnn_tpu.cache.presample import presample_static_ranking
    from fgnn_tpu.parallel.shuffler import EpochShuffler

    # star graph: every node points at node 0 (plus a ring edge)
    N = 50
    dst = []
    indptr = [0]
    for v in range(N):
        dst += [0, (v + 1) % N]
        indptr.append(len(dst))
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(dst, np.int32)

    class FakeBatch:
        def __init__(self, ids):
            self.input_nodes = jnp.asarray(ids)

    def sample_fn(key, seeds, n):
        return FakeBatch(np.asarray(seeds))

    sh = EpochShuffler(np.arange(1, N, dtype=np.int32), 16, 16)
    ranking = presample_static_ranking(
        sample_fn, sh, indptr, indices, N, presample_epoch=1, seed=0
    )
    assert ranking[0] == 0, "hub node must rank first"
