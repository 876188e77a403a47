"""Cache ranking policies.

Analogs of the reference's precomputed ``cache_by_*.bin`` rankers
(utility/data-process/toolkit/cache/cache_by_{degree,degree_hop,heuristic,
fake_optimal,random}.cc) plus the runtime presampling policy (cache/presample
module). A ranking is a permutation of node ids, hottest first; the cache
manager takes the top ``cache_percentage * num_node`` entries.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import CachePolicy
from ..data.schema import Dataset


def rank_by_degree(ds: Dataset) -> np.ndarray:
    """cache_by_degree.cc: sort by out-degree descending."""
    deg = ds.degrees()
    return np.argsort(-deg.astype(np.int64), kind="stable").astype(np.int32)


def rank_by_degree_hop(ds: Dataset, num_hop: int = 2) -> np.ndarray:
    """cache_by_degree_hop.cc: rank by expected multi-hop reach —
    degree(v) + sum of degree(u) over v's neighbors u (one sparse pass:
    segment-sum of neighbor out-degrees per source vertex)."""
    deg = ds.degrees().astype(np.float64)
    indptr = np.asarray(ds.indptr)
    indices = np.asarray(ds.indices)
    nbr_deg = deg[indices]
    # sum per CSR segment; cumsum-diff avoids np.add.at's slow scatter
    csum = np.concatenate([[0.0], np.cumsum(nbr_deg)])
    nbr_deg_sum = csum[indptr[1:]] - csum[indptr[:-1]]
    score = deg + nbr_deg_sum
    return np.argsort(-score, kind="stable").astype(np.int32)


def rank_by_heuristic(ds: Dataset) -> np.ndarray:
    """cache_by_heuristic.cc: train-set-aware degree heuristic — training
    seeds are always touched, so boost them above raw degree."""
    deg = ds.degrees().astype(np.float64)
    score = deg.copy()
    score[ds.train_set] += deg.max() + 1
    return np.argsort(-score, kind="stable").astype(np.int32)


def rank_random(ds: Dataset, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.permutation(ds.num_node).astype(np.int32)


def rank_fake_optimal(access_freq: np.ndarray) -> np.ndarray:
    """cache_by_fake_optimal.cc: rank by true access frequency from a
    profiling run (Profiler node-access log)."""
    return np.argsort(-access_freq.astype(np.int64), kind="stable").astype(np.int32)


def build_ranking(
    ds: Dataset,
    policy: CachePolicy,
    seed: int = 0,
    access_freq: Optional[np.ndarray] = None,
) -> np.ndarray:
    if policy == CachePolicy.DEGREE:
        return rank_by_degree(ds)
    if policy == CachePolicy.DEGREE_HOP:
        return rank_by_degree_hop(ds)
    if policy == CachePolicy.HEURISTIC:
        return rank_by_heuristic(ds)
    if policy == CachePolicy.RANDOM:
        return rank_random(ds, seed)
    if policy == CachePolicy.FAKE_OPTIMAL:
        assert access_freq is not None, "fake_optimal needs an access log"
        return rank_fake_optimal(access_freq)
    if policy in (CachePolicy.PRESAMPLE, CachePolicy.PRESAMPLE_STATIC):
        raise ValueError("use fgnn_tpu.cache.presample_ranking for presample")
    raise ValueError(f"no ranking builder for {policy}")
