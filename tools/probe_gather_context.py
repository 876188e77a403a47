"""Why is the in-context feature gather 4x slower than standalone?

profile_fused_breakdown measured (1M nodes, bench config):
  multi_layer_sample (all outputs)   11.4 ms
  sample + feature gather            32.4 ms   -> gather-in-context ~21 ms
  feature gather alone (random ids)   5.0 ms
This probe differences the middle: same scanned-program methodology,
isolating (a) data-dependence on sampler-produced ids vs (b) program
co-residency, (c) the pad-mask `where`, (d) id distribution (dup-heavy
vs uniform random).
"""
import os
import sys
import time

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
    num_node = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
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
    feat = eng.feat_dev
    U = plan.num_unique_cap[-1]

    def key_of(i):
        return jax.random.fold_in(jax.random.key(0), i)

    def sample_forced(i, g_, s, n_):
        b = multi_layer_sample(key_of(i), g_, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=False)
        acc = jnp.sum(b.input_nodes) + jnp.sum(b.output_nodes)
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local) + jnp.sum(blk.dst_local)
        return acc, b

    # A. sampling only (baseline)
    scan_timer("A sample only", lambda i, g_, s, n_:
               sample_forced(i, g_, s, n_)[0], steps, g, seeds, num)

    # B. sample + gather on INDEPENDENT random ids (co-residency test)
    def b_body(i, g_, f, s, n_):
        acc, _ = sample_forced(i, g_, s, n_)
        ids = jax.random.randint(jax.random.fold_in(key_of(i), 7), (U,),
                                 0, num_node, jnp.int32)
        return acc + jnp.sum(jnp.take(f, ids, axis=0))
    scan_timer("B sample + gather(random ids)", b_body, steps, g, feat,
               seeds, num)

    # C. sample + take() on sampled ids, no pad-mask where
    def c_body(i, g_, f, s, n_):
        acc, b = sample_forced(i, g_, s, n_)
        safe = jnp.maximum(b.input_nodes, 0)
        return acc + jnp.sum(jnp.take(f, safe, axis=0))
    scan_timer("C sample + take(sampled ids)", c_body, steps, g, feat,
               seeds, num)

    # D. sample + full device_gather (take + where), as the engine does
    from fgnn_tpu.ops.extract import device_gather
    def d_body(i, g_, f, s, n_):
        acc, b = sample_forced(i, g_, s, n_)
        return acc + jnp.sum(device_gather(f, b.input_nodes))
    scan_timer("D sample + device_gather(sampled ids)", d_body, steps, g,
               feat, seeds, num)

    # E. gather alone on dup-heavy ids (sampled-id distribution, no sample
    #    in program): ids drawn from a small range to mimic dup locality
    def e_body(i, f):
        ids = jax.random.randint(key_of(i), (U,), 0, num_node, jnp.int32)
        return jnp.sum(jnp.take(f, ids, axis=0))
    scan_timer("E take(random ids) alone", e_body, steps, feat)

    # F. sample + gather through optimization_barrier (fusion isolation)
    def f_body(i, g_, f, s, n_):
        acc, b = sample_forced(i, g_, s, n_)
        ids = jax.lax.optimization_barrier(jnp.maximum(b.input_nodes, 0))
        return acc + jnp.sum(jnp.take(f, ids, axis=0))
    scan_timer("F sample + take(barrier(ids))", f_body, steps, g, feat,
               seeds, num)

    print("done", flush=True)


if __name__ == "__main__":
    main()
