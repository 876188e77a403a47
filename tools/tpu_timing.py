"""Truthful timing on the axon backend.

block_until_ready() does NOT synchronize over the axon tunnel and bulk
device_get runs at ~12MB/s, so: reduce outputs to a scalar ON DEVICE and
fetch only that scalar to force completion.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    acc = jnp.float32(0)
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating) or jnp.issubdtype(
            l.dtype, jnp.integer
        ):
            acc = acc + jnp.sum(l).astype(jnp.float32)
        elif l.dtype == jnp.bool_:
            acc = acc + jnp.sum(l.astype(jnp.int32)).astype(jnp.float32)
    return acc


_scalarize_jit = jax.jit(_scalarize)


def sync(out):
    """Force completion of `out`; returns after device finished."""
    return float(_scalarize_jit(out))


def timed(name, fn, *args, n=10, inner=1):
    """Median-of-n wall time of fn(*args), each sample forcing a sync."""
    out = fn(*args)
    sync(out)  # warm-up + compile
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        samples.append((time.perf_counter() - t0) / inner)
    med = float(np.median(samples))
    if name:
        print(f"{name:42s} {med*1e3:9.3f} ms")
    return med, out
