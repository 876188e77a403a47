"""Dynamic feature cache (arch4 analog).

Reference: GPUDynamicCacheManager (cuda_cache_manager.h:81-132) +
DoGPUSampleDyCache / DoDynamicCacheFeatureCopy (cuda_loops.cc:269-498,
1124-1295): instead of a static hot-set, the cache is *replaced every
step* with the previous batch's gathered features — exploiting
batch-to-batch overlap of input nodes.

TPU redesign: the cache state is a pytree carried between steps — the
previous batch's (sorted ids, permutation, features) all device-resident;
membership is a searchsorted against the sorted ids (replacing the
rebuilt GPU hashtable), and the combine is gather-only like the static
manager.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

INT_MAX = jnp.iinfo(jnp.int32).max


@struct.dataclass
class DynCacheState:
    ids_sorted: jnp.ndarray   # [cap] int32, ascending, INT_MAX padded
    row: jnp.ndarray          # [cap] int32: feats row for ids_sorted[i]
    feats: jnp.ndarray        # [cap, F] previous batch's features


def init_state(cap: int, feat_dim: int) -> DynCacheState:
    return DynCacheState(
        ids_sorted=jnp.full((cap,), INT_MAX, jnp.int32),
        row=jnp.zeros((cap,), jnp.int32),
        feats=jnp.zeros((cap, feat_dim), jnp.float32),
    )


def split_hits(
    state: DynCacheState, input_nodes: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jittable hit/miss split vs the previous batch.

    Returns (hit mask [cap], cache_row [cap], miss_ids [cap] misses
    compacted to the front, rank [cap], num_miss).
    """
    cap = state.ids_sorted.shape[0]
    q = jnp.where(input_nodes < 0, INT_MAX, input_nodes)
    p = jnp.clip(jnp.searchsorted(state.ids_sorted, q), 0, cap - 1)
    hit = (state.ids_sorted[p] == q) & (q != INT_MAX)
    cache_row = jnp.where(hit, state.row[p], 0)

    valid = input_nodes >= 0
    miss = valid & ~hit
    sort_key = jnp.where(miss, 0, jnp.where(hit, 1, 2)).astype(jnp.int32)
    order = jnp.argsort(sort_key, stable=True)
    rank = jnp.argsort(order, stable=True).astype(jnp.int32)
    miss_ids = jnp.where(sort_key[order] == 0, input_nodes[order], -1)
    return hit, cache_row, miss_ids.astype(jnp.int32), rank, jnp.sum(miss)


def combine_and_update(
    state: DynCacheState,
    input_nodes: jnp.ndarray,
    hit: jnp.ndarray,
    cache_row: jnp.ndarray,
    rank: jnp.ndarray,
    miss_feat: jnp.ndarray,
) -> Tuple[jnp.ndarray, DynCacheState]:
    """Combine hit/miss features and replace the cache with this batch
    (ReplaceCacheGPU analog) — one fused jittable step."""
    cache_part = jnp.take(state.feats, cache_row, axis=0, mode="clip")
    miss_part = jnp.take(miss_feat, rank, axis=0, mode="clip")
    out = jnp.where(hit[:, None], cache_part, miss_part)
    out = jnp.where((input_nodes >= 0)[:, None], out, 0)

    # new cache = this batch
    q = jnp.where(input_nodes < 0, INT_MAX, input_nodes)
    order = jnp.argsort(q)
    new_state = DynCacheState(
        ids_sorted=q[order],
        row=order.astype(jnp.int32),
        feats=out,
    )
    return out, new_state


class DynamicFeatureCache:
    """Host-side orchestration wrapper (engine-facing API parity with
    FeatureCache)."""

    def __init__(self, feat_host: np.ndarray, cap: int, mod: int = 0):
        self.feat_host = feat_host
        # empty-feat modulo (CPUMockExtract analog); pass ds.feat_mod
        self.mod = mod
        self.state = init_state(cap, feat_host.shape[1])
        self._split = jax.jit(split_hits)
        self._combine = jax.jit(combine_and_update)

    def extract(self, input_nodes: jnp.ndarray) -> jnp.ndarray:
        from .. import native

        hit, cache_row, miss_ids, rank, num_miss = self._split(
            self.state, input_nodes
        )
        n_miss = int(num_miss)
        ids_np = np.asarray(miss_ids)
        if self.mod:
            ids_np = np.where(ids_np >= 0, ids_np % self.mod, ids_np)
        if native.available() and self.feat_host.dtype == np.float32:
            miss = native.gather_f32(self.feat_host, ids_np, n_real=n_miss)
        else:
            miss = np.zeros(
                (len(ids_np), self.feat_host.shape[1]), np.float32
            )
            if n_miss:
                miss[:n_miss] = self.feat_host[
                    np.maximum(ids_np[:n_miss], 0)
                ]
        out, self.state = self._combine(
            self.state, input_nodes, hit, cache_row, rank, jnp.asarray(miss)
        )
        self.last_num_miss = n_miss
        self.last_num_hit = int(jnp.sum(hit))
        return out
