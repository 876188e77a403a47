"""Honest per-primitive ladder at tiered HEAD (varying seeds, live bwd).

probe_tiered_gap.py showed the fixed-seed ladder under-measures by
7 ms/step: loop-invariant seed work gets hoisted and the unused backward
pass dead-coded. Every level here scans over the REAL epoch seed pile
(one batch per iteration, like the engine), and the final level carries
the train state through the scan so fwd+bwd+adam are all live.

  S0 hop0 sample_layer
  S1 + hop0 unique_and_remap
  S2 + hop1 deg fetch + tier partition sort
  S3 + tier picks (Floyd A, iota B)
  S4 + CSR fetch both tiers
  S5 full tiered multi_layer_sample (all outputs consumed)
  S6 + feature gather
  S7 + forward
  S8 full train step, state carried (bwd+adam live)

Usage: python tools/profile_tiered_ladder.py [num_nodes]
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
from fgnn_tpu.engine import OneChipEngine
from fgnn_tpu.ops.extract import device_gather, label_gather
from fgnn_tpu.ops.hashtable import unique_and_remap
from fgnn_tpu.ops.sampling import (
    _floyd_without_replacement,
    multi_layer_sample,
    sample_layer,
    take_1d_blocked,
)


def timer(name, prog, args, steps, reps=3):
    r = prog(*args)                       # compile
    float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = prog(*args)
        # reduce to scalar + fetch = the only reliable sync on the tunnel
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / steps * 1e3
    print(f"{name:40s} {per:9.3f} ms/iter", flush=True)
    return per


def main():
    num_node = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from bench import load_or_make_dataset

    if num_node == 1_000_000:
        ds = load_or_make_dataset()
    else:
        from fgnn_tpu.data import make_synthetic_dataset

        ds = make_synthetic_dataset(num_node=num_node, avg_degree=15,
                                    feat_dim=128, num_class=172,
                                    train_frac=0.25, seed=0)
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5, lr=0.003)
    eng = OneChipEngine(cfg, ds)
    plan = eng.plan
    assert plan.tier_a_cap is not None, "tier must engage"
    print(f"# plan: {plan}", flush=True)
    piles = list(eng.shuffler.batches(0))
    sa = jnp.asarray(np.stack([p[0] for p in piles]))
    na = jnp.asarray(np.array([p[1] for p in piles], dtype=np.int32))
    steps = sa.shape[0]
    g, feat, label = eng.graph, eng.feat_dev, eng.label_dev
    f0, f1 = plan.fanouts
    VA, fB = plan.tier_a_cap, plan.tier_b_fanout

    def key_of(i, sub):
        return jax.random.fold_in(jax.random.fold_in(jax.random.key(0), i),
                                  sub)

    def scanned(body_fn, with_state=False):
        @jax.jit
        def prog(g_, f_, l_, sa_, na_, st):
            def body(carry, inp):
                s, n, i = inp
                out = body_fn(i, s, n, g_, f_, l_, carry)
                if with_state:
                    st2, val = out
                    return st2, val
                return carry, out

            c0 = st if with_state else jnp.float32(0)
            c, vals = jax.lax.scan(
                body, c0, (sa_, na_, jnp.arange(steps)))
            return vals

        return prog

    results = {}

    def hop0(i, s, n, g_):
        nbr, valid, _ = sample_layer(key_of(i, 0), g_, s, f0,
                                     cfg.sample_type)
        return jnp.sum(nbr) + jnp.sum(valid)

    def frontier(i, s, n, g_):
        nbr, valid, _ = sample_layer(key_of(i, 0), g_, s, f0,
                                     cfg.sample_type)
        uniq, nu, loc, ovf = unique_and_remap(
            s, n, jnp.where(valid, nbr, -1), plan.num_unique_cap[0])
        return uniq, nu, loc

    levels = []

    def S0(i, s, n, g_, f_, l_, c):
        return hop0(i, s, n, g_).astype(jnp.float32)

    def S1(i, s, n, g_, f_, l_, c):
        uniq, nu, loc = frontier(i, s, n, g_)
        return (jnp.sum(uniq) + jnp.sum(loc) + nu).astype(jnp.float32)

    def partition(i, s, n, g_):
        uniq, nu, loc = frontier(i, s, n, g_)
        ok = uniq >= 0
        safe = jnp.where(ok, uniq, 0)
        off = g_.indptr[safe]
        deg = (g_.indptr[safe + 1] - off).astype(jnp.int32)
        deg = jnp.where(ok, deg, 0)
        V = uniq.shape[0]
        isA = deg > fB
        iota_v = jax.lax.iota(jnp.int32, V)
        _, order, deg_p, off_p = jax.lax.sort(
            ((~isA).astype(jnp.int32), iota_v, deg, off), num_keys=2)
        inv = jax.lax.sort((order, iota_v), num_keys=1)[1]
        return uniq, loc, deg_p, off_p, order, inv

    def S2(i, s, n, g_, f_, l_, c):
        uniq, loc, deg_p, off_p, order, inv = partition(i, s, n, g_)
        return (jnp.sum(deg_p) + jnp.sum(order) + jnp.sum(inv)
                + jnp.sum(loc)).astype(jnp.float32)

    def picks(i, s, n, g_):
        uniq, loc, deg_p, off_p, order, inv = partition(i, s, n, g_)
        idxA, validA = _floyd_without_replacement(
            key_of(i, 1), deg_p[:VA], f1)
        V = uniq.shape[0]
        colB = jax.lax.broadcasted_iota(jnp.int32, (V - VA, fB), 1)
        validB = colB < jnp.minimum(deg_p[VA:], fB)[:, None]
        return uniq, loc, off_p, order, inv, idxA, validA, colB, validB

    def S3(i, s, n, g_, f_, l_, c):
        uniq, loc, off_p, order, inv, idxA, vA, colB, vB = picks(
            i, s, n, g_)
        return (jnp.sum(idxA) + jnp.sum(vA) + jnp.sum(vB)
                + jnp.sum(loc) + jnp.sum(inv)).astype(jnp.float32)

    def S4(i, s, n, g_, f_, l_, c):
        uniq, loc, off_p, order, inv, idxA, vA, colB, vB = picks(
            i, s, n, g_)
        E_idx = g_.indices.shape[0] - 1
        pd = g_.indptr.dtype
        flatA = jnp.clip(off_p[:VA][:, None]
                         + jnp.maximum(idxA, 0).astype(pd), 0, E_idx)
        nbrA = take_1d_blocked(g_.indices, flatA.reshape(-1))
        flatB = jnp.clip(off_p[VA:][:, None] + colB.astype(pd), 0, E_idx)
        nbrB = take_1d_blocked(g_.indices, flatB.reshape(-1))
        return (jnp.sum(nbrA) + jnp.sum(nbrB) + jnp.sum(vA) + jnp.sum(vB)
                + jnp.sum(loc) + jnp.sum(inv)).astype(jnp.float32)

    def sample_full(i, s, n, g_):
        return multi_layer_sample(key_of(i, 99), g_, s, n, plan,
                                  cfg.sample_type, dedup_last_hop=False)

    def S5(i, s, n, g_, f_, l_, c):
        b = sample_full(i, s, n, g_)
        acc = jnp.sum(b.input_nodes) + jnp.sum(b.output_nodes)
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local) + jnp.sum(blk.dst_local)
        return acc.astype(jnp.float32)

    def S6(i, s, n, g_, f_, l_, c):
        b = sample_full(i, s, n, g_)
        acc = jnp.sum(device_gather(f_, b.input_nodes))
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local).astype(jnp.float32)
        return acc.astype(jnp.float32)

    def S7(i, s, n, g_, f_, l_, c):
        b = sample_full(i, s, n, g_)
        feats = device_gather(f_, b.input_nodes)
        logits = eng.model.apply({"params": eng.state.params}, b, feats,
                                 eng.dst_caps, deterministic=True)
        return jnp.sum(logits).astype(jnp.float32)

    from fgnn_tpu.train.loop import make_train_step

    step_fn = make_train_step(eng.model, eng.tx, eng.dst_caps,
                              cfg.batch_size)

    def S8(i, s, n, g_, f_, l_, st):
        b = sample_full(i, s, n, g_)
        feats = device_gather(f_, b.input_nodes)
        labels = label_gather(l_, b.output_nodes)
        k = key_of(i, 7)
        st2, loss, acc = step_fn(st, b, feats, labels, k)
        return st2, loss

    names = ["S0 hop0 sample", "S1 + hop0 remap",
             "S2 + deg fetch + partition sort", "S3 + tier picks",
             "S4 + CSR fetch", "S5 full tiered sample",
             "S6 + feature gather", "S7 + forward",
             "S8 train step (state carried)"]
    bodies = [S0, S1, S2, S3, S4, S5, S6, S7]
    vals = []
    for name, body in zip(names[:-1], bodies):
        prog = scanned(body)
        vals.append(timer(name, prog,
                          (g, feat, label, sa, na, eng.state), steps))
    prog8 = scanned(S8, with_state=True)
    vals.append(timer(names[-1], prog8,
                      (g, feat, label, sa, na, eng.state), steps))

    print("\n# honest tiered budget (ms/step):")
    prev = 0.0
    for name, v in zip(names, vals):
        print(f"#   {name:36s} {v:7.2f}  (+{v - prev:6.2f})")
        prev = v


if __name__ == "__main__":
    main()
