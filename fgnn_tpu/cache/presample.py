"""Pre-sampling cache policy — the paper's headline contribution.

Analog of PreSampler::DoPreSample (cuda/pre_sampler.cc:57-132 and
dist/pre_sampler.cc): before training starts, run the *configured* sampler
for ``presample_epoch`` epochs with the real RNG and count how often each
vertex appears in a batch's ``input_nodes``; rank vertices by that
frequency. Because epoch-to-epoch hot sets are 64-91% similar (SURVEY §6),
this approaches the optimal cache ranking at degree-policy cost.

The counting runs with the same jitted sampler used in training (so the
compile is shared); frequencies accumulate on-device via one-hot scatter
(`bincount` analog) and only the final ranking comes back to host.

The PRESAMPLE_STATIC variant (DoGPUSampleAllNeighbour, cuda_loops.cc:500-575)
counts *all* neighbors of touched nodes instead of sampled ones.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig, SampleType
from ..ops.padding import SamplePlan
from ..ops.sampling import CSRGraph
from ..parallel.shuffler import EpochShuffler
from ..utils import Timer, get_logger
from ..utils.profiler import Profiler

log = get_logger(__name__)


def presample_ranking(
    sample_fn: Callable,              # (key, seeds, num) -> SampledBatch (jitted)
    shuffler: EpochShuffler,
    num_node: int,
    presample_epoch: int = 1,
    seed: int = 0,
) -> np.ndarray:
    """Run presample epochs, return ranking (hottest first).

    ``sample_fn`` must be the SAME compiled sampler the engine trains with
    (pre_sampler.cc reuses DoGPUSample), guaranteeing the counted
    distribution matches training.
    """
    t = Timer()
    base = jax.random.key(seed ^ 0x9E3779B9)

    @jax.jit
    def count_batch(freq, input_nodes):
        ids = jnp.where(input_nodes >= 0, input_nodes, num_node)
        return freq.at[ids].add(1, mode="drop")

    freq = jnp.zeros((num_node,), dtype=jnp.int32)
    for epoch in range(presample_epoch):
        for seeds, n, step in shuffler.batches(epoch):
            key = jax.random.fold_in(base, epoch * shuffler.num_step + step)
            batch = sample_fn(key, jnp.asarray(seeds), jnp.int32(n))
            freq = count_batch(freq, batch.input_nodes)

    freq_np = np.asarray(freq)
    # stable sort: frequency desc, id asc (reference packs Id64(node,count)
    # and gnu_parallel-sorts, pre_sampler.cc:96-109)
    ranking = np.argsort(-freq_np.astype(np.int64), kind="stable").astype(np.int32)
    Profiler.get().log_init("init_presample", t.passed())
    log.info(
        "presample: %d epochs in %.2fs; top node freq=%d",
        presample_epoch, t.passed(), int(freq_np.max(initial=0)),
    )
    return ranking


def presample_static_ranking(
    sample_fn: Callable,
    shuffler: EpochShuffler,
    indptr: np.ndarray,
    indices: np.ndarray,
    num_node: int,
    presample_epoch: int = 1,
    seed: int = 0,
) -> np.ndarray:
    """PRESAMPLE_STATIC (DoGPUSampleAllNeighbour, cuda_loops.cc:500-575):
    count every CSR neighbor of the touched frontier instead of only the
    sampled ones — a smoother estimate that is sampling-RNG independent.

    Counting runs host-side (init-time only; the all-neighbor expansion
    has data-dependent size, which the device path cannot express with
    static shapes)."""
    t = Timer()
    base = jax.random.key(seed ^ 0x51BA11)
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    freq = np.zeros(num_node, dtype=np.int64)
    for epoch in range(presample_epoch):
        for seeds, n, step in shuffler.batches(epoch):
            key = jax.random.fold_in(base, epoch * shuffler.num_step + step)
            batch = sample_fn(key, jnp.asarray(seeds), jnp.int32(n))
            ids = np.asarray(batch.input_nodes)
            ids = ids[ids >= 0]
            np.add.at(freq, ids, 1)
            # expand to ALL neighbors of the frontier
            starts = indptr[ids]
            lens = (indptr[ids + 1] - starts).astype(np.int64)
            total = int(lens.sum())
            if total:
                base_off = np.repeat(np.cumsum(lens) - lens, lens)
                flat = (
                    np.repeat(starts, lens)
                    + np.arange(total, dtype=np.int64) - base_off
                )
                np.add.at(freq, indices[flat], 1)
    ranking = np.argsort(-freq, kind="stable").astype(np.int32)
    Profiler.get().log_init("init_presample", t.passed())
    log.info("presample-static: %d epochs in %.2fs", presample_epoch,
             t.passed())
    return ranking
