"""Distribution tests for the PinSAGE random-walk sampler.

Golden model: a NumPy re-simulation of the reference semantics
(cuda_sampling_random_walk.cu:43-160): W independent walks of length L
per seed; each step picks a uniform neighbor of the current node, records
the visit, then terminates the walk with ``restart_prob`` (the reference's
"restart" kills the walk rather than teleporting). Dead/zero-degree
frontiers record -1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.ops.random_walk import random_walk_visits, topk_by_frequency
from fgnn_tpu.ops.sampling import CSRGraph


def _tiny_graph():
    # 6 nodes; node 5 has no out edges (dead end)
    indptr = np.array([0, 3, 5, 8, 10, 12, 12], dtype=np.int32)
    indices = np.array([1, 2, 3, 0, 2, 0, 1, 4, 4, 5, 2, 3], dtype=np.int32)
    return indptr, indices


def _golden_visit_freq(indptr, indices, seed_node, W, L, restart_prob,
                       trials, rng):
    """Per-node expected visit counts per (seed, trial) from NumPy walks."""
    num_node = len(indptr) - 1
    freq = np.zeros(num_node, dtype=np.float64)
    dead = 0
    for _ in range(trials * W):
        node = seed_node
        for _step in range(L):
            deg = indptr[node + 1] - indptr[node]
            if deg == 0:
                dead += 1
                break
            node = indices[indptr[node] + rng.integers(0, deg)]
            freq[node] += 1
            if rng.random() < restart_prob:
                break
    return freq / trials


@pytest.mark.parametrize("restart_prob", [0.0, 0.5])
def test_visit_distribution_matches_golden(restart_prob):
    indptr, indices = _tiny_graph()
    graph = CSRGraph(indptr=jnp.asarray(indptr), indices=jnp.asarray(indices))
    W, L = 4, 3
    seed_node = 0
    trials = 800

    seeds = jnp.full((trials,), seed_node, dtype=jnp.int32)
    visits = np.asarray(
        jax.jit(random_walk_visits, static_argnums=(3, 4, 5))(
            jax.random.key(7), graph, seeds, W, L, restart_prob
        )
    )  # [trials, W*L]
    ours = np.zeros(len(indptr) - 1, dtype=np.float64)
    flat = visits[visits >= 0]
    np.add.at(ours, flat, 1.0)
    ours /= trials

    golden = _golden_visit_freq(indptr, indices, seed_node, W, L,
                                restart_prob, trials,
                                np.random.default_rng(3))

    # expected visits per node per trial agree within sampling noise
    assert ours.sum() > 0
    np.testing.assert_allclose(ours, golden, rtol=0.15, atol=0.12)


def test_restart_prob_one_walks_exactly_one_step():
    indptr, indices = _tiny_graph()
    graph = CSRGraph(indptr=jnp.asarray(indptr), indices=jnp.asarray(indices))
    seeds = jnp.arange(5, dtype=jnp.int32)
    visits = np.asarray(random_walk_visits(
        jax.random.key(0), graph, seeds, 2, 4, 1.0))
    # [n, W*L] laid out walk-major: steps 0..L-1 per walk
    v = visits.reshape(5, 2, 4)
    assert (v[:, :, 0] >= 0).all()      # first step always taken
    assert (v[:, :, 1:] == -1).all()    # then the walk dies


def test_dead_end_records_no_visits():
    indptr, indices = _tiny_graph()
    graph = CSRGraph(indptr=jnp.asarray(indptr), indices=jnp.asarray(indices))
    seeds = jnp.array([5], dtype=jnp.int32)  # zero out-degree
    visits = np.asarray(random_walk_visits(
        jax.random.key(0), graph, seeds, 3, 3, 0.0))
    assert (visits == -1).all()


def test_topk_by_frequency_golden():
    visits = jnp.array([
        [3, 3, 1, 2, 3, 2, -1, -1],
        [7, -1, -1, -1, -1, -1, -1, -1],
        [-1, -1, -1, -1, -1, -1, -1, -1],
    ], dtype=jnp.int32)
    dst, w = topk_by_frequency(visits, 3)
    dst, w = np.asarray(dst), np.asarray(w)
    assert dst[0].tolist() == [3, 2, 1] and w[0].tolist() == [3.0, 2.0, 1.0]
    assert dst[1, 0] == 7 and w[1, 0] == 1.0
    assert (dst[1, 1:] == -1).all() and (w[1, 1:] == 0.0).all()
    assert (dst[2] == -1).all() and (w[2] == 0.0).all()
