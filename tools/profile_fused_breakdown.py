"""Decompose steady-state fused-step time by differencing scanned programs.

Each candidate program is scanned over `steps` iterations inside ONE jit
(mirroring the engine's whole-epoch scan), so per-call tunnel round-trips
amortize away and the numbers match what the epoch actually pays.

Usage: python tools/profile_fused_breakdown.py [num_nodes] [steps]
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
from fgnn_tpu.ops.sampling import multi_layer_sample, sample_layer
from fgnn_tpu.ops.hashtable import unique_and_remap


def scan_timer(name, make_body, steps, *args, reps=3):
    """Build jit(scan(body)) over `steps` iters; report per-iter ms."""

    @jax.jit
    def prog(*a):
        def body(carry, i):
            out = make_body(i, *a)
            # fold into the carry so no iteration can be DCE'd
            return carry + out.astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    r = prog(*args)
    float(r)  # compile + run once
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(*args))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / steps * 1e3
    print(f"{name:40s} {per:9.3f} ms/iter")
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
    label = eng.label_dev

    def key_of(i):
        return jax.random.fold_in(jax.random.key(0), i)

    # 1. hop0 sample only (no dedup)
    scan_timer(
        "hop0 sample_layer", lambda i, g, s: jnp.sum(
            sample_layer(key_of(i), g, s, plan.fanouts[0],
                         cfg.sample_type)[0]
        ), steps, g, seeds,
    )

    DEDUP = False   # mirror the engine's feat-on-device fast mode

    # 2. full sampling pipeline — reduce over ALL outputs so nothing is
    # DCE'd (blocks included; summing only input_nodes lets XLA delete
    # the whole remap machinery and undercounts badly)
    def sample_all(i, g, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        acc = jnp.sum(b.input_nodes) + jnp.sum(b.output_nodes)
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local) + jnp.sum(blk.dst_local)
        return acc

    scan_timer("multi_layer_sample (all outputs)", sample_all, steps, g,
               seeds, num)

    # 3. sampling + feature gather
    def samp_gather(i, g, f, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        acc = jnp.sum(device_gather(f, b.input_nodes))
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local).astype(jnp.float32)
        return acc

    scan_timer("sample + feature gather", samp_gather, steps, g, feat,
               seeds, num)

    # 3b. + forward pass only (no grad)
    def samp_fwd(i, g, f, l, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        feats = device_gather(f, b.input_nodes)
        logits = eng.model.apply(
            {"params": eng.state.params}, b, feats, eng.dst_caps,
            deterministic=True,
        )
        return jnp.sum(logits)

    scan_timer("sample + gather + forward", samp_fwd, steps, g, feat,
               label, seeds, num)

    # 4. feature gather alone (random ids)
    def gather_only(i, f):
        ids = jax.random.randint(
            key_of(i), (plan.num_unique_cap[-1],), 0, num_node, jnp.int32
        )
        return jnp.sum(device_gather(f, ids))

    scan_timer("feature gather alone", gather_only, steps, feat)

    # 5. hop1-size unique_and_remap alone (random inputs)
    E1 = plan.num_input_cap[1] * plan.fanouts[1]
    S1 = plan.num_input_cap[1]

    def remap_only(i, _g):
        k = key_of(i)
        sd = jax.random.randint(k, (S1,), 0, num_node, jnp.int32)
        nb = jax.random.randint(
            jax.random.fold_in(k, 1), (E1,), 0, num_node, jnp.int32
        )
        u, nu, loc, ovf = unique_and_remap(sd, jnp.int32(S1), nb,
                                           plan.num_unique_cap[1])
        return jnp.sum(loc) + jnp.sum(u)

    scan_timer("hop1 unique_and_remap", remap_only, steps, g)

    # 6. full fused step (sample + gather + fwd/bwd + adam)
    state0 = eng.state

    def fused(i, g, f, l, st):
        st2, loss, acc, ne, ovf = eng._fused_g(
            jax.tree.map(lambda x: x, st), g, f, l, key_of(i), seeds, num
        )
        return loss

    # NOTE: donation disabled by passing a copy via tree.map identity?
    # Donation happens per-call on arg 0 of _fused_g; inside jit-of-jit the
    # inner jit is inlined, so no double-free — but keep state out of the
    # carry to be safe.
    def fused_body(i, g, f, l, st):
        batch = multi_layer_sample(key_of(i), g, seeds, num, plan,
                                   cfg.sample_type, dedup_last_hop=DEDUP)
        feats = device_gather(f, batch.input_nodes)
        labels = label_gather(l, batch.output_nodes)
        from fgnn_tpu.train.loop import make_train_step

        step_fn = make_train_step(eng.model, eng.tx, eng.dst_caps,
                                  cfg.batch_size)
        st2, loss, acc = step_fn(st, batch, feats, labels, key_of(i))
        return loss

    scan_timer("full fused step", fused_body, steps, g, feat, label, state0)

    # 7. train-only on a FIXED batch (no sampling/gather in the loop)
    batch0 = jax.jit(
        lambda: multi_layer_sample(key_of(0), g, seeds, num, plan,
                                   cfg.sample_type)
    )()
    feats0 = device_gather(feat, batch0.input_nodes)
    labels0 = label_gather(label, batch0.output_nodes)
    from fgnn_tpu.train.loop import make_train_step

    step_fn = make_train_step(eng.model, eng.tx, eng.dst_caps,
                              cfg.batch_size)

    def train_only(i, b, f0, l0, st):
        st2, loss, acc = step_fn(st, b, f0, l0, key_of(i))
        return loss

    scan_timer("train-only (fixed batch)", train_only, steps, batch0,
               feats0, labels0, state0)
    print("done")


if __name__ == "__main__":
    main()
