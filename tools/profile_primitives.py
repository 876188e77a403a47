"""Measure XLA primitive costs on this chip at sampler-relevant sizes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms")
    return out


def main():
    N = 1 << 20  # ~1M
    S = 40_320
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100_000, N).astype(np.int32))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    tbl = jnp.asarray(rng.random((100_000, 1)).astype(np.float32)[:, 0])
    seeds = jnp.asarray(rng.choice(100_000, S, replace=False).astype(np.int32))
    upd = jnp.asarray(rng.random(N).astype(np.float32))

    timed("sort 1M int32", jax.jit(jnp.sort), x)
    timed("argsort 1M int32", jax.jit(jnp.argsort), x)
    sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    timed("lax.sort 3-operand (2 keys) 1M", sort3, x, x, idx)
    timed("cumsum 1M int32", jax.jit(lambda a: jnp.cumsum(a)), x)
    timed("cummax 1M int32", jax.jit(lambda a: jax.lax.cummax(a, axis=0)), x)
    timed("gather 1M from 100k", jax.jit(lambda t, i: t[i]), tbl,
          x % 100_000)
    scat = jax.jit(lambda i, u: jnp.zeros(N, jnp.float32).at[i].set(
        u, unique_indices=True))
    timed("perm-scatter(set,unique) 1M", scat, idx, upd)
    scat_add = jax.jit(lambda i, u: jnp.zeros(100_000, jnp.float32).at[i % 100_000].add(u))
    timed("scatter-add 1M -> 100k", scat_add, x, upd)
    seg = jax.jit(lambda d, i: jax.ops.segment_sum(d, i, num_segments=100_000))
    timed("segment_sum 1M -> 100k", seg, upd, x % 100_000)
    ss = jax.jit(lambda k, q: jnp.searchsorted(k, q))
    timed("searchsorted 1M queries in 40k", ss, jnp.sort(seeds), x)
    ssс = jax.jit(lambda k, q: jnp.searchsorted(k, q, method='sort'))
    timed("searchsorted method=sort", ssс, jnp.sort(seeds), x)
    uq = jax.jit(lambda a: jnp.unique(a, size=100_000, fill_value=2**31 - 1))
    timed("jnp.unique(size=100k) on 1M", uq, x)
    # feature-gather at scale: 100k x 128
    feat = jnp.asarray(rng.random((100_000, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100_000, 100_096).astype(np.int32))
    timed("row gather 100k x128", jax.jit(lambda t, i: t[i]), feat, ids)


if __name__ == "__main__":
    main()
