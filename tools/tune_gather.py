"""Tune the blocked 1D gather lane width and compare Pallas row gather.

Usage: python tools/tune_gather.py
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


def scan_time(name, body, steps, *args, reps=3):
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
    print(f"{name:44s} {min(ts)/steps*1e3:8.2f} ms", flush=True)


def blocked(table, idx, lane):
    rows = table.reshape(-1, lane)
    rid = jnp.clip(idx // lane, 0, rows.shape[0] - 1)
    off = (idx % lane).astype(jnp.int32)
    g = jnp.take(rows, rid, axis=0)
    l = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    return jnp.sum(jnp.where(l == off[:, None], g, 0), axis=1)


def main():
    key = jax.random.key(0)

    def kof(i):
        return jax.random.fold_in(key, i)

    N = 15_000_000 + 8   # pad to 128-lane multiple
    N -= N % 128
    T = jnp.asarray(np.random.randint(0, 1 << 30, N, dtype=np.int32))
    M = 2_019_200

    def plain(i, t):
        ids = jax.random.randint(kof(i), (M,), 0, N, jnp.int32)
        return jnp.sum(jnp.take(t, ids, mode="clip"))

    scan_time("plain take 1D x 2M", plain, 10, T)

    for lane in (8, 16, 32, 64, 128):
        def b(i, t, lane=lane):
            ids = jax.random.randint(kof(i), (M,), 0, N, jnp.int32)
            return jnp.sum(blocked(t, ids, lane))

        scan_time(f"blocked lane={lane} x 2M", b, 10, T)

    # pallas row gather on bf16 feature-shaped tables
    from fgnn_tpu.ops.pallas_gather import gather_rows

    for dt, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        F = jnp.asarray(
            np.random.rand(538_496, 128).astype(np.float32)
        ).astype(dt)
        Mf = 2_019_328

        def tk(i, f):
            ids = jax.random.randint(kof(i), (Mf,), 0, f.shape[0], jnp.int32)
            return jnp.sum(jnp.take(f, ids, axis=0).astype(jnp.float32))

        def pg(i, f):
            ids = jax.random.randint(kof(i), (Mf,), 0, f.shape[0], jnp.int32)
            return jnp.sum(gather_rows(f, ids).astype(jnp.float32))

        scan_time(f"take   [538K,128]{nm} x 2M", tk, 5, F)
        scan_time(f"pallas [538K,128]{nm} x 2M", pg, 5, F)


if __name__ == "__main__":
    main()
