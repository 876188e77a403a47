"""Round-2 gather measurement campaign (run on the real chip).

Maps the platform's gather behavior to decide the round-2 kernel:
  1. XLA gather cost model: time vs num-ids (M) and vs table rows (N).
  2. Contiguous-DMA streaming ceiling (chunked HBM->VMEM->HBM copy).
  3. Pallas v2 unrolled DMA gather sweep (unroll x ngroups x block).

Usage: python tools/gather_campaign.py [xla|stream|pallas|all]
Timing: scan REPS inside one jit, different ids per rep, reduce to a
scalar (tools/tpu_timing rules — block_until_ready doesn't sync here).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 8


def timed_scan(name, body, *args, reps=REPS, trials=3):
    """body(i, *args) -> array; time scan of `reps` iterations / reps."""

    @jax.jit
    def prog(*a):
        def f(c, i):
            return c + jnp.sum(body(i, *a)).astype(jnp.float32), None

        acc, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(reps))
        return acc

    t0 = time.perf_counter()
    float(prog(*args))  # compile + warm
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(prog(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / reps * 1e3
    print(f"{name:58s} {ms:9.3f} ms   (compile {tc:.0f}s)", flush=True)
    return ms


def ids_for(i, m, n):
    return jax.random.randint(
        jax.random.fold_in(jax.random.key(7), i), (m,), 0, n, jnp.int32
    )


def xla_campaign():
    print("== XLA gather cost model ==", flush=True)
    D = 128
    # M sweep at fixed table
    N = 1_000_000
    tab32 = jnp.zeros((N, D), jnp.float32) + 1.0
    for M in (262_144, 524_288, 1_048_576, 2_097_152, 4_194_304):
        timed_scan(
            f"xla f32 N=1M M={M/1e6:.2f}M",
            lambda i, t: jnp.take(t, ids_for(i, M, N), axis=0,
                                  mode="clip"),
            tab32,
        )
    # N sweep at fixed M
    M = 2_097_152
    for N in (131_072, 262_144, 524_288, 1_048_576, 2_097_152):
        tab = jnp.zeros((N, D), jnp.float32) + 1.0
        timed_scan(
            f"xla f32 M=2M N={N/1e6:.2f}M",
            lambda i, t: jnp.take(t, ids_for(i, M, t.shape[0]), axis=0,
                                  mode="clip"),
            tab,
        )
    # dtype at fixed M, N
    N = 1_048_576
    for dt, nm in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        tab = jnp.zeros((N, D), dt)
        timed_scan(
            f"xla {nm} M=2M N=1M",
            lambda i, t: jnp.take(t, ids_for(i, M, N), axis=0, mode="clip"),
            tab,
        )
    # feature-dim sweep (is cost per row or per byte?)
    for D2 in (64, 256, 512):
        tab = jnp.zeros((N, D2), jnp.float32)
        timed_scan(
            f"xla f32 M=2M N=1M D={D2}",
            lambda i, t: jnp.take(t, ids_for(i, M, N), axis=0, mode="clip"),
            tab,
        )
    # gather + mean fused (does XLA avoid materializing the gather?)
    tabf = jnp.zeros((N, D), jnp.float32) + 1.0
    timed_scan(
        "xla f32 gather+mean25 M=2M (81920 dst)",
        lambda i, t: jnp.take(
            t, ids_for(i, 81920 * 25, N), axis=0, mode="clip"
        ).reshape(81920, 25, D).mean(axis=1),
        tabf,
    )


def stream_campaign():
    """Contiguous copy ceiling via a trivial Pallas double-buffer pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== streaming ceiling ==", flush=True)
    D = 128

    def copy_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    for chunk in (512, 2048, 8192):
        N = 524_288  # 256MB f32

        @jax.jit
        def stream(x):
            return pl.pallas_call(
                copy_kernel,
                grid=(N // chunk,),
                in_specs=[pl.BlockSpec((chunk, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((chunk, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
            )(x)

        x = jnp.zeros((N, D), jnp.float32)
        ms = timed_scan(
            f"stream copy 256MB chunk={chunk}r",
            lambda i, t: stream(t * 1.0),
            x, reps=4,
        )
        gbs = 2 * N * D * 4 / ms * 1e3 / 1e9
        print(f"    -> {gbs:.0f} GB/s r+w", flush=True)


def base_campaign():
    """Primitive cost model: streaming, reduction, sort, scatter — the
    economics of compaction/dedup vs padded per-edge gathers."""
    print("== primitive baselines ==", flush=True)
    N, D = 524_288, 128  # 256MB f32
    x = jnp.zeros((N, D), jnp.float32)
    ms = timed_scan("xla elementwise x+i (256MB)",
                    lambda i, t: t + i.astype(jnp.float32), x)
    print(f"    -> {2 * N * D * 4 / ms * 1e3 / 1e9:.0f} GB/s r+w",
          flush=True)
    ms = timed_scan("xla sum (256MB)",
                    lambda i, t: jnp.sum(t + 0.0 * i.astype(jnp.float32),
                                         keepdims=True), x)
    print(f"    -> {N * D * 4 / ms * 1e3 / 1e9:.0f} GB/s read (incl. the "
          "t+0*i copy)", flush=True)
    M = 2_097_152
    timed_scan("xla sort 2.1M i32 (1 key)",
               lambda i, _: jnp.sort(ids_for(i, M, N)), x)
    timed_scan(
        "xla sort 2.1M i32 (key+value)",
        lambda i, _: jax.lax.sort(
            [ids_for(i, M, N), jnp.arange(M, dtype=jnp.int32)], num_keys=1
        )[0],
        x,
    )
    timed_scan("xla argsort 2.1M i32",
               lambda i, _: jnp.argsort(ids_for(i, M, N)), x)
    timed_scan(
        "xla cumsum 2.1M i32",
        lambda i, _: jnp.cumsum(ids_for(i, M, N) & 1), x,
    )
    # scatter-add 2.1M -> 538K (GCN out-degree shape)
    U = 538_000
    timed_scan(
        "xla scatter-add 2.1M into 538K",
        lambda i, _: jnp.zeros((U,), jnp.float32).at[
            ids_for(i, M, U)
        ].add(1.0, mode="drop"),
        x,
    )
    # segment-sum of [2.1M, 128] rows into 84K dst (aggregation alternative)
    tabm = jnp.zeros((M, 8), jnp.float32)
    timed_scan(
        "xla scatter-add rows [2.1M,8] into 84K",
        lambda i, t: jnp.zeros((84_000, 8), jnp.float32).at[
            ids_for(i, M, 84_000)
        ].add(t, mode="drop"),
        tabm,
    )


def ids_valid_mix(i, m, n, frac_valid):
    """Random ids with (1-frac_valid) of positions set to -1 (padding)."""
    k = jax.random.fold_in(jax.random.key(11), i)
    ids = jax.random.randint(k, (m,), 0, n, jnp.int32)
    mask = jax.random.uniform(jax.random.fold_in(k, 1), (m,)) < frac_valid
    return jnp.where(mask, ids, -1)


def pallas_campaign():
    from fgnn_tpu.ops.pallas_gather2 import gather_rows_v2

    print("== pallas v2 sweep ==", flush=True)
    D = 128
    N = 1_048_576
    M = 2_097_152
    tab = jnp.zeros((N, D), jnp.float32) + 1.0
    for unroll, ngroups, block in (
        (1, 16, 2048),   # ~round-1 shape
        (4, 4, 2048),
        (8, 4, 2048),
        (8, 8, 2048),
        (16, 4, 2048),
        (16, 8, 4096),
        (32, 4, 4096),
    ):
        timed_scan(
            f"pallas f32 u={unroll} g={ngroups} b={block}",
            lambda i, t: gather_rows_v2(
                t, ids_for(i, M, N), block_rows=block,
                unroll=unroll, ngroups=ngroups,
            ),
            tab, reps=4,
        )
    # skip-invalid: 60% valid ids (the padded-COO regime)
    for unroll, ngroups, block in ((8, 4, 2048), (16, 8, 4096)):
        timed_scan(
            f"pallas f32 60%valid skip u={unroll} g={ngroups} b={block}",
            lambda i, t: gather_rows_v2(
                t, ids_valid_mix(i, M, N, 0.6), block_rows=block,
                unroll=unroll, ngroups=ngroups, skip_invalid=True,
            ),
            tab, reps=4,
        )
        timed_scan(
            f"xla   f32 60%valid       (control)",
            lambda i, t: jnp.where(
                (ids_valid_mix(i, M, N, 0.6) >= 0)[:, None],
                jnp.take(t, jnp.maximum(ids_valid_mix(i, M, N, 0.6), 0),
                         axis=0, mode="clip"),
                0.0,
            ),
            tab, reps=4,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # fixed ~200s first-use tunnel warmup: pay it on something tiny
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8,))))
    print(f"warmup {time.perf_counter()-t0:.0f}s; devices={jax.devices()}",
          flush=True)
    if which in ("xla", "all"):
        xla_campaign()
    if which in ("stream", "all"):
        stream_campaign()
    if which in ("base", "all"):
        base_campaign()
    if which in ("pallas", "all"):
        pallas_campaign()


if __name__ == "__main__":
    main()
