"""Per-step dispatch cost over the axon tunnel.

The engine's fast path fuses a whole epoch into one lax.scan because
round-1 measured ~50-100ms per Python dispatch. But JAX dispatch is
asynchronous — if dispatches pipeline, a per-step fused_step loop should
cost ~device-time + ONE final sync, making the fused-step path viable at
papers100M scale where the whole-epoch program won't compile remotely.

Measures: (a) whole-epoch scan, (b) per-step fused dispatches with one
final fetch, (c) per-step dispatches with a per-step fetch (the naive
loop). Bench config, 32 steps.
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
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine


def main():
    ds = make_synthetic_dataset(num_node=1_000_000, avg_degree=15,
                                feat_dim=128, num_class=64,
                                train_frac=0.25, seed=0)
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5)
    eng = OneChipEngine(cfg, ds)
    seeds_all, nums_all = eng.shuffler.epoch_arrays(0)
    seeds_dev = jnp.asarray(seeds_all)
    nums_dev = jnp.asarray(nums_all)
    steps = seeds_all.shape[0]
    key = jax.random.key(7)

    # (a) whole-epoch scan
    for rep in range(3):
        t0 = time.perf_counter()
        st, (loss, acc, edges, ovf) = eng.epoch_fused(
            eng.state, jax.random.fold_in(key, rep), seeds_dev, nums_dev)
        eng.state = st
        float(loss)
        print(f"a scan-epoch rep{rep}: {time.perf_counter()-t0:.3f}s",
              flush=True)

    # (b) per-step dispatches, single final fetch
    for rep in range(3):
        t0 = time.perf_counter()
        losses = []
        for i in range(steps):
            k = jax.random.fold_in(jax.random.fold_in(key, 100 + rep), i)
            st, loss, acc2, ne, ovf = eng.fused_step(
                eng.state, k, seeds_dev[i], nums_dev[i])
            eng.state = st
            losses.append(loss)
        float(jnp.stack(losses).mean())
        print(f"b perstep-async rep{rep}: {time.perf_counter()-t0:.3f}s "
              f"({(time.perf_counter()-t0)/steps*1e3:.1f} ms/step)",
              flush=True)

    # (c) per-step dispatches with a per-step scalar fetch
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            k = jax.random.fold_in(jax.random.fold_in(key, 200 + rep), i)
            st, loss, acc2, ne, ovf = eng.fused_step(
                eng.state, k, seeds_dev[i], nums_dev[i])
            eng.state = st
            float(loss)
        print(f"c perstep-sync rep{rep}: {time.perf_counter()-t0:.3f}s "
              f"({(time.perf_counter()-t0)/steps*1e3:.1f} ms/step)",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
