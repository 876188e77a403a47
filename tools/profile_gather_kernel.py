"""Pallas gather_rows vs jnp.take on real TPU shapes.

Usage: python tools/profile_gather_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fgnn_tpu.ops.pallas_gather import gather_rows


def scan_time(name, body, steps, *args, reps=3, bytes_moved=None):
    @jax.jit
    def prog(*a):
        def f(c, i):
            return c + body(i, *a).astype(jnp.float32), None
        acc, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(steps))
        return acc

    float(prog(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(*args))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / steps
    bw = (bytes_moved / per / 1e9) if bytes_moved else 0
    print(f"{name:44s} {per*1e3:8.2f} ms  {bw:7.1f} GB/s", flush=True)


def main():
    key = jax.random.key(0)

    def kof(i):
        return jax.random.fold_in(key, i)

    cases = [
        ("[538K,128]f32 x 2.02M", 538496, 128, 2019328),
        ("[81K,256]f32 x 806K", 80768, 256, 806400),
        ("[1M,128]f32 x 538K", 1_000_000, 128, 538624),
    ]
    for name, N, D, M in cases:
        T = jnp.asarray(np.random.rand(N, D).astype(np.float32))

        def take_body(i, t):
            ids = jax.random.randint(kof(i), (M,), 0, N, jnp.int32)
            return jnp.sum(jnp.take(t, ids, axis=0))

        def pallas_body(i, t):
            ids = jax.random.randint(kof(i), (M,), 0, N, jnp.int32)
            return jnp.sum(gather_rows(t, ids))

        nbytes = M * D * 4
        scan_time(f"take   {name}", take_body, 10, T, bytes_moved=nbytes)
        scan_time(f"pallas {name}", pallas_body, 10, T, bytes_moved=nbytes)


if __name__ == "__main__":
    main()
