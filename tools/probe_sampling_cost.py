"""Decompose multi_layer_sample's ~11.4 ms/step (bench config).

Suspects: threefry RNG (compute-heavy on TPU; rbg is a hardware
bit-generator), the CSR index fetch (row-rate-bound gather of neighbor
ids), and the intermediate unique_and_remap sort.

Usage: python tools/probe_sampling_cost.py [impl] (impl: threefry2x32|rbg)
"""
import os
import sys
import time

impl = sys.argv[1] if len(sys.argv) > 1 else None
if impl:
    os.environ["JAX_DEFAULT_PRNG_IMPL"] = impl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine
from fgnn_tpu.ops.sampling import multi_layer_sample


def scan_timer(name, make_body, steps, *args, reps=3):
    @jax.jit
    def prog(*a):
        def body(carry, i):
            return carry + make_body(i, *a).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    float(prog(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(*args))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / steps * 1e3
    print(f"{name:48s} {per:9.3f} ms/iter", flush=True)
    return per


def main():
    steps = 20
    num_node = 1_000_000
    ds = make_synthetic_dataset(num_node=num_node, avg_degree=15,
                                feat_dim=128, num_class=64,
                                train_frac=0.05, seed=0)
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5)
    eng = OneChipEngine(cfg, ds)
    plan = eng.plan
    seeds_np, n, _ = next(eng.shuffler.batches(0))
    seeds = jnp.asarray(seeds_np)
    num = jnp.int32(n)
    g = eng.graph
    print(f"prng impl: {jax.random.key(0).dtype}", flush=True)

    def key_of(i):
        return jax.random.fold_in(jax.random.key(0), i)

    # raw RNG cost at last-hop volume: uniform (81280, 25)
    S1 = plan.num_input_cap[1]
    F1 = plan.fanouts[1]
    scan_timer("uniform (hop1 volume)", lambda i: jnp.sum(
        jax.random.uniform(key_of(i), (S1, F1))), steps)

    # CSR neighbor-id fetch at hop1 volume: gather indices at random
    # edge offsets (row-rate suspect)
    indices = g.indices if hasattr(g, "indices") else None
    if indices is not None:
        E = indices.shape[0]
        def idx_fetch(i, idx):
            offs = jax.random.randint(key_of(i), (S1 * F1,), 0, E, jnp.int32)
            return jnp.sum(jnp.take(idx, offs))
        scan_timer("indices fetch (hop1 volume)", idx_fetch, steps, indices)

    def sample_forced(i, g_, s, n_):
        b = multi_layer_sample(key_of(i), g_, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=False)
        acc = jnp.sum(b.input_nodes) + jnp.sum(b.output_nodes)
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local) + jnp.sum(blk.dst_local)
        return acc

    scan_timer("multi_layer_sample (all outputs)", sample_forced, steps,
               g, seeds, num)
    print("done", flush=True)


if __name__ == "__main__":
    main()
