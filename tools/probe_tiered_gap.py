"""Locate the tiered-epoch gap: engine epoch program vs budget ladder.

Round-5 anomaly: the budget ladder's full fused step measures 25.5 ms at
tiered HEAD, but bench.py's epoch = 33.4 ms/step — a ~7 ms/step gap that
did NOT exist at round-4 HEAD (37.5 vs 38.8). Both are timed here in ONE
process on the chip:

  A. engine.run_epochs(1,3)          — exactly what bench.py reports
  B. engine.run_epoch(1) x3          — single-epoch dispatch + fetch
  C. budget-style scan(32) of the same fused body, same seeds pile
  D. C but with the engine's n_edges/overflow stats reductions added

Usage: python tools/probe_tiered_gap.py
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

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data import make_synthetic_dataset
from fgnn_tpu.engine import OneChipEngine
from fgnn_tpu.ops.extract import device_gather, label_gather
from fgnn_tpu.ops.sampling import multi_layer_sample


def main():
    from bench import load_or_make_dataset

    ds = load_or_make_dataset()
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5, lr=0.003)
    eng = OneChipEngine(cfg, ds)
    print(f"# plan: {eng.plan}", flush=True)
    steps = eng.shuffler.num_step

    # A. run_epochs window (bench's measurement)
    eng.run_epoch(0)  # warmup/compile
    t0 = time.perf_counter()
    out = eng.run_epochs(1, 3)
    tA = (time.perf_counter() - t0) / 3
    print(f"A run_epochs window        {tA*1e3/steps:8.2f} ms/step "
          f"({tA:.3f} s/epoch)", flush=True)

    # B. single run_epoch x3 (per-epoch fetch included)
    ts = []
    for e in range(4, 7):
        t0 = time.perf_counter()
        eng.run_epoch(e)
        ts.append(time.perf_counter() - t0)
    tB = min(ts)
    print(f"B run_epoch (min of 3)     {tB*1e3/steps:8.2f} ms/step "
          f"({tB:.3f} s/epoch)", flush=True)

    # C/D. budget-style scan over the engine's own seeds pile
    seeds_all, nums_all = eng._epoch_seed_arrays(1) if hasattr(
        eng, "_epoch_seed_arrays") else (None, None)
    if seeds_all is None:
        piles = list(eng.shuffler.batches(1))
        seeds_all = jnp.asarray(np.stack([p[0] for p in piles]))
        nums_all = jnp.asarray(np.array([p[1] for p in piles],
                                        dtype=np.int32))
    from fgnn_tpu.train.loop import make_train_step

    step_fn = make_train_step(eng.model, eng.tx, eng.dst_caps,
                              cfg.batch_size)
    g, feat, label = eng.graph, eng.feat_dev, eng.label_dev
    plan = eng.plan

    # big tables enter as jit ARGUMENTS (engine._sample docstring) — a
    # closure constant embeds 256MB of features into the HLO and the
    # remote compile service rejects the body (HTTP 413)
    def body_plain(g_, f_, l_, st, inp):
        seeds, n, i = inp
        key = jax.random.fold_in(jax.random.key(9), i)
        b = multi_layer_sample(key, g_, seeds, n, plan, cfg.sample_type,
                               dedup_last_hop=False)
        feats = device_gather(f_, b.input_nodes)
        labels = label_gather(l_, b.output_nodes)
        st2, loss, acc = step_fn(st, b, feats, labels, key)
        return st2, loss

    def body_stats(g_, f_, l_, st, inp):
        seeds, n, i = inp
        key = jax.random.fold_in(jax.random.key(9), i)
        b = multi_layer_sample(key, g_, seeds, n, plan, cfg.sample_type,
                               dedup_last_hop=False)
        feats = device_gather(f_, b.input_nodes)
        labels = label_gather(l_, b.output_nodes)
        st2, loss, acc = step_fn(st, b, feats, labels, key)
        n_edges = sum(jnp.sum(bl.mask).astype(jnp.int32) for bl in b.blocks)
        return st2, (loss, acc, n_edges, b.overflowed)

    idx = jnp.arange(steps, dtype=jnp.int32)

    for name, body in (("C scan, no stats", body_plain),
                       ("D scan + stats", body_stats)):
        @jax.jit
        def prog(g_, f_, l_, st, sa, na):
            st2, aux = jax.lax.scan(
                lambda st, inp: body(g_, f_, l_, st, inp), st,
                (sa, na, idx))
            first = aux[0] if isinstance(aux, tuple) else aux
            return jnp.sum(first)

        r = prog(g, feat, label, eng.state, seeds_all, nums_all)
        float(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(g, feat, label, eng.state, seeds_all, nums_all))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name:26s} {t*1e3/steps:8.2f} ms/step ({t:.3f} s/epoch)",
              flush=True)


if __name__ == "__main__":
    main()
