"""Direct-index dedup+remap must match the sort-based implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.ops.hashtable import unique_and_remap, unique_and_remap_direct


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_direct_matches_sort(seed):
    rng = np.random.default_rng(seed)
    N = 500
    S, E, cap = 32, 256, 128
    seeds = np.full(S, -1, np.int32)
    n_seed = 20
    seeds[:n_seed] = rng.choice(N, n_seed, replace=False)
    nbrs = np.full(E, -1, np.int32)
    n_real = 180
    nbrs[:n_real] = rng.integers(0, N, n_real)
    # shuffle padding positions around to exercise masking
    perm = rng.permutation(E)
    nbrs = nbrs[perm]

    a = unique_and_remap(
        jnp.asarray(seeds), jnp.int32(n_seed), jnp.asarray(nbrs), cap
    )
    b = unique_and_remap_direct(
        jnp.asarray(seeds), jnp.int32(n_seed), jnp.asarray(nbrs), cap, N
    )
    for x, y, name in zip(a, b, ["unique", "num_unique", "nbr_local",
                                 "overflowed"]):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )


def test_direct_overflow_clips():
    N = 100
    S, E, cap = 8, 64, 12   # room for only 4 new nodes
    seeds = np.arange(8, dtype=np.int32)
    nbrs = np.arange(20, 70, dtype=np.int32)[:E]
    nbrs = np.resize(nbrs, E).astype(np.int32)
    a = unique_and_remap(
        jnp.asarray(seeds), jnp.int32(S), jnp.asarray(nbrs), cap
    )
    b = unique_and_remap_direct(
        jnp.asarray(seeds), jnp.int32(S), jnp.asarray(nbrs), cap, N
    )
    assert bool(a[3]) and bool(b[3])          # both flag overflow
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    assert int(b[1]) == cap
