"""The fused one-sort unique+remap must agree with the reference pair."""
import jax
import jax.numpy as jnp
import numpy as np

from fgnn_tpu.ops.hashtable import (
    lookup_local_ids,
    unique_and_remap,
    unique_with_seeds,
)


def _case(rng, n_seed, S, E, pool):
    seeds = rng.choice(pool, size=n_seed, replace=False).astype(np.int32)
    seeds_pad = np.full(S, -1, np.int32)
    seeds_pad[:n_seed] = seeds
    nbrs = rng.choice(pool, size=E).astype(np.int32)
    nbrs[rng.random(E) < 0.1] = -1  # padding holes
    return seeds_pad, n_seed, nbrs


def test_fused_matches_reference_pair():
    rng = np.random.default_rng(0)
    for trial in range(6):
        seeds_pad, n_seed, nbrs = _case(rng, 40, 64, 300, 2000)
        cap = 512
        u1, n1, ovf1 = unique_with_seeds(
            jnp.asarray(seeds_pad), jnp.int32(n_seed), jnp.asarray(nbrs), cap
        )
        l1 = lookup_local_ids(u1, 64, jnp.asarray(nbrs))
        u2, n2, l2, ovf2 = unique_and_remap(
            jnp.asarray(seeds_pad), jnp.int32(n_seed), jnp.asarray(nbrs), cap
        )
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        assert int(n1) == int(n2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert bool(ovf1) == bool(ovf2)


def test_fused_locals_resolve():
    rng = np.random.default_rng(3)
    seeds_pad, n_seed, nbrs = _case(rng, 50, 64, 400, 500)
    cap = 640
    u, n, loc, ovf = unique_and_remap(
        jnp.asarray(seeds_pad), jnp.int32(n_seed), jnp.asarray(nbrs), cap
    )
    u, loc = np.asarray(u), np.asarray(loc)
    for g, l in zip(nbrs, loc):
        if g < 0:
            assert l == -1
        else:
            assert l >= 0 and u[l] == g


def test_fused_overflow_clips():
    seeds = jnp.array([0, 1], dtype=jnp.int32)
    nbrs = jnp.array([5, 6, 7, 8, 9, 10], dtype=jnp.int32)
    u, n, loc, ovf = unique_and_remap(seeds, jnp.int32(2), nbrs, out_cap=4)
    assert bool(ovf)
    u, loc = np.asarray(u), np.asarray(loc)
    # clipped neighbors map to -1; kept ones resolve
    for g, l in zip([5, 6, 7, 8, 9, 10], loc):
        assert l == -1 or u[l] == g
    assert int(n) <= 4


def test_with_counts_matches_numpy_multiplicity():
    rng = np.random.default_rng(7)
    for trial in range(5):
        seeds_pad, n_seed, nbrs = _case(rng, 40, 64, 300, 150)
        cap = 512
        u, n, loc, ovf, cnt = unique_and_remap(
            jnp.asarray(seeds_pad), jnp.int32(n_seed), jnp.asarray(nbrs),
            cap, with_counts=True,
        )
        u, loc, cnt = np.asarray(u), np.asarray(loc), np.asarray(cnt)
        # golden: multiplicity of each unique value among valid neighbors
        golden = np.zeros(cap, np.int64)
        for g, l in zip(nbrs, loc):
            if g >= 0:
                assert l >= 0
                golden[l] += 1
        np.testing.assert_array_equal(cnt, golden)
        # padded-seed slots carry zero (new locals start at S=64, so
        # [n_used_seeds, S) is the padded-seed hole)
        assert (cnt[40:64] == 0).all()


def test_with_counts_under_overflow():
    seeds = jnp.array([0, 1], dtype=jnp.int32)
    nbrs = jnp.array([5, 5, 6, 7, 8, 9, 0], dtype=jnp.int32)
    u, n, loc, ovf, cnt = unique_and_remap(
        seeds, jnp.int32(2), nbrs, out_cap=4, with_counts=True
    )
    assert bool(ovf)
    u, loc, cnt = np.asarray(u), np.asarray(loc), np.asarray(cnt)
    golden = np.zeros(4, np.int64)
    for g, l in zip([5, 5, 6, 7, 8, 9, 0], loc):
        if g >= 0 and l >= 0:
            golden[l] += 1
    np.testing.assert_array_equal(cnt, golden)
