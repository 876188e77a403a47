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


def np_sample_hop_vec(
    rng: np.random.Generator,
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    replace: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized hop sampler (cpu_sampling_khop*.cc analog).

    seeds: [n] valid node ids. Returns (nbr [n, fanout] int32 -1-padded,
    valid mask [n, fanout]). Distribution matches the jax samplers
    (uniform with/without replacement).
    """
    n = len(seeds)
    off = indptr[seeds]
    deg = (indptr[seeds + 1] - off).astype(np.int64)
    if replace:
        u = rng.random((n, fanout))
        idx = np.minimum((u * deg[:, None]).astype(np.int64), deg[:, None] - 1)
        valid = np.broadcast_to((deg > 0)[:, None], idx.shape)
    else:
        # vectorized Floyd (mirrors ops.sampling._floyd_without_replacement)
        u = rng.random((n, fanout))
        idx = np.full((n, fanout), -1, dtype=np.int64)
        big = deg >= fanout
        for j in range(fanout):
            J = deg - fanout + j
            t = np.minimum((u[:, j] * (J + 1)).astype(np.int64), J)
            if j > 0:
                coll = (idx[:, :j] == t[:, None]).any(axis=1)
                t = np.where(coll, J, t)
            small = np.where(j < deg, j, -1)
            idx[:, j] = np.where(big, t, small)
        valid = idx >= 0
    flat = off[:, None] + np.maximum(idx, 0)
    nbr = indices[np.minimum(flat, len(indices) - 1)].astype(np.int32)
    return np.where(valid, nbr, -1), valid


def calibrate_caps(
    indptr: np.ndarray,
    indices: np.ndarray,
    train_set: np.ndarray,
    batch_size: int,
    fanouts_sampling_order: Sequence[int],
    num_probe: int = 8,
    seed: int = 0,
    replace: bool = False,
    tier_candidates: "Optional[Sequence[int]]" = None,
) -> "List[Tuple[int, int]]":
    """Per-hop unique-count caps from random probe batches.

    PredictNumNodes analog (reference common.h:244-250), but measured
    rather than worst-case. Cap = max over probes PLUS the observed
    probe-to-probe range as headroom: a few probes estimate the location
    of the epoch maximum but not its tail, and an under-cap silently
    clips batches mid-epoch (MULTICHIP_r02 tripped the overflow backstop
    with 2 plain-max probes). The range margin scales with the config's
    actual batch variance — skewed graphs get real headroom, regular
    graphs pay nothing — and the engine's ALLOC_SCALE (1.25x, the
    reference's allocation scale, constant.h:78) still applies on top.

    Returns one ``(cumulative, new)`` pair per hop: the cumulative unique
    count and the NEW-nodes-appended count, both max-plus-range. The plan
    sizes each hop's unique buffer as ``static_seed_block + new`` — the
    buffer layout keeps seeds at their input positions, so the appended
    region is what actually needs capacity (a cumulative cap clamped at
    num_node left ZERO append room once the frontier saturated the graph,
    guaranteeing clipping — fig17a round-4 regression).
    """
    rng = np.random.default_rng(seed)
    num_probe = max(2, num_probe)
    obs = [[] for _ in fanouts_sampling_order]
    obs_new = [[] for _ in fanouts_sampling_order]
    tier_obs = {fB: [] for fB in (tier_candidates or ())}
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    last = len(fanouts_sampling_order) - 1
    for _ in range(num_probe):
        seeds = rng.choice(train_set, size=min(batch_size, len(train_set)),
                           replace=False)
        cur = np.unique(seeds)
        for l, f in enumerate(fanouts_sampling_order):
            if l == last and tier_obs:
                # degree-tier sizing for the last hop: how many frontier
                # vertices exceed each candidate small-tier width
                deg = indptr[cur + 1] - indptr[cur]
                for fB in tier_obs:
                    tier_obs[fB].append(int((deg > fB).sum()))
            nbr, valid = np_sample_hop_vec(rng, indptr, indices, cur, f,
                                           replace)
            uniq = np.union1d(cur, nbr[valid])
            obs[l].append(len(uniq))
            obs_new[l].append(len(uniq) - len(cur))
            cur = uniq
    caps = []
    for counts, news in zip(obs, obs_new):
        hi, lo = max(counts), min(counts)
        nhi, nlo = max(news), min(news)
        caps.append((hi + (hi - lo), nhi + (nhi - nlo)))
    if tier_candidates is not None:
        return caps, tier_obs
    return caps
