"""Pure-NumPy reference sampler.

Golden model for tests (SURVEY.md §4 implication: golden numerics vs a
pure-NumPy reference) and the cap-calibration oracle: the engine runs a few
NumPy sampling steps to measure realistic per-hop unique/edge counts, which
bound the static padded shapes (SamplePlan) far below the multiplicative
worst case — the TPU analog of PredictNumNodes (common.h:244-250).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def np_sample_hop(
    rng: np.random.Generator,
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    replace: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (src_global, dst_global) edge lists (variable length)."""
    srcs, dsts = [], []
    for v in seeds:
        off, end = int(indptr[v]), int(indptr[v + 1])
        deg = end - off
        if deg == 0:
            continue
        if replace:
            picks = rng.integers(0, deg, size=fanout)
        elif deg <= fanout:
            picks = np.arange(deg)
        else:
            picks = rng.choice(deg, size=fanout, replace=False)
        nb = indices[off + picks]
        srcs.append(nb)
        dsts.append(np.full(len(nb), v, dtype=np.int64))
    if not srcs:
        return np.array([], np.int64), np.array([], np.int64)
    return np.concatenate(srcs), np.concatenate(dsts)


def np_multi_layer_counts(
    rng: np.random.Generator,
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: np.ndarray,
    fanouts: Sequence[int],
    replace: bool = False,
) -> Tuple[List[int], List[int]]:
    """Per-hop (num_unique, num_edge) for cap calibration.

    ``fanouts`` already in sampling order (seed hop first).
    """
    cur = np.unique(seeds)
    uniq_counts, edge_counts = [], []
    for f in fanouts:
        src, dst = np_sample_hop(rng, indptr, indices, cur, f, replace)
        uniq = np.union1d(cur, src)
        uniq_counts.append(len(uniq))
        edge_counts.append(len(src))
        cur = uniq
    return uniq_counts, edge_counts


def calibrate_caps(
    indptr: np.ndarray,
    indices: np.ndarray,
    train_set: np.ndarray,
    batch_size: int,
    fanouts_sampling_order: Sequence[int],
    num_probe: int = 3,
    seed: int = 0,
    replace: bool = False,
) -> List[int]:
    """Max observed per-hop unique counts over a few random batches."""
    rng = np.random.default_rng(seed)
    caps = [0] * len(fanouts_sampling_order)
    for _ in range(num_probe):
        seeds = rng.choice(train_set, size=min(batch_size, len(train_set)),
                           replace=False)
        u, _ = np_multi_layer_counts(
            rng, indptr, indices, seeds, fanouts_sampling_order, replace
        )
        caps = [max(a, b) for a, b in zip(caps, u)]
    return caps
