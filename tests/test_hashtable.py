import jax
import jax.numpy as jnp
import numpy as np

from fgnn_tpu.ops.hashtable import unique_with_seeds, lookup_local_ids


def test_unique_with_seeds_basic():
    seeds = jnp.array([7, 3, 9, -1], dtype=jnp.int32)
    nbrs = jnp.array([3, 5, 7, 1, 5, -1, 9, 2], dtype=jnp.int32)
    unique, n, ovf = unique_with_seeds(seeds, jnp.int32(3), nbrs, out_cap=10)
    unique = np.asarray(unique)
    # seeds first, in input order (padding preserved as -1 -> moved)
    assert list(unique[:3]) == [7, 3, 9]
    # appended new nodes ascending: {1, 2, 5}
    got_new = [x for x in unique[4:] if x >= 0] if unique[3] == -1 else None
    # slot 3 was a seed padding slot -> stays -1 (sentinel)
    assert unique[3] == -1
    assert [x for x in unique[4:] if x >= 0] == [1, 2, 5]
    assert int(n) == 6
    assert not bool(ovf)


def test_unique_overflow_flag():
    seeds = jnp.array([0, 1], dtype=jnp.int32)
    nbrs = jnp.array([5, 6, 7, 8, 9, 10], dtype=jnp.int32)
    unique, n, ovf = unique_with_seeds(seeds, jnp.int32(2), nbrs, out_cap=4)
    assert bool(ovf)


def test_lookup_local_ids_roundtrip():
    rng = np.random.default_rng(0)
    seeds = rng.choice(1000, size=50, replace=False).astype(np.int32)
    nbr_pool = rng.choice(1000, size=300).astype(np.int32)
    S = 64
    seeds_pad = np.full(S, -1, np.int32)
    seeds_pad[:50] = seeds
    unique, n, ovf = unique_with_seeds(
        jnp.array(seeds_pad), jnp.int32(50), jnp.array(nbr_pool), out_cap=512
    )
    unique_np = np.asarray(unique)
    local = np.asarray(lookup_local_ids(unique, S, jnp.array(nbr_pool)))
    assert not bool(ovf)
    for g, l in zip(nbr_pool, local):
        assert l >= 0, f"{g} not found"
        assert unique_np[l] == g
    # padding queries
    pad = np.asarray(lookup_local_ids(unique, S, jnp.array([-1], jnp.int32)))
    assert pad[0] == -1


def test_unique_jit_and_dedup_against_numpy():
    rng = np.random.default_rng(1)
    f = jax.jit(lambda s, n, x: unique_with_seeds(s, n, x, out_cap=256))
    for trial in range(5):
        seeds = rng.choice(500, size=30, replace=False).astype(np.int32)
        nbrs = rng.choice(500, size=100).astype(np.int32)
        uniq, n, _ = f(jnp.array(seeds), jnp.int32(30), jnp.array(nbrs))
        expect = set(seeds) | set(nbrs)
        got = set(int(x) for x in np.asarray(uniq) if x >= 0)
        assert got == expect
        assert int(n) == len(expect)
