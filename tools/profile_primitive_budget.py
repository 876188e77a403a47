"""Per-primitive budget of the fused step at HEAD shapes (VERDICT r4 #1).

CAVEAT (round 5, probe_tiered_gap.py): this ladder scans a FIXED seed
batch, so XLA hoists seed-invariant work out of the loop and dead-codes
the unused backward pass — it under-measures the full step by ~7 ms at
bench shapes. Use tools/profile_tiered_ladder.py (varying seeds, live
state carry) for honest absolute numbers; this tool remains useful for
RELATIVE comparisons between adjacent ladder levels.

Builds a cumulative ladder of scanned programs A..I; adjacent differences
isolate each primitive's steady-state cost:

  A  hop0 sample_layer                  (deg fetch + picks + CSR fetch)
  B  A + hop0 unique_and_remap          (dedup sort + local remap)
  C  B + hop1 deg fetch                 (indptr gathers on the frontier)
  D  C + hop1 Floyd picks               (RNG + collision scan)
  E  D + hop1 CSR neighbor fetch        (blocked row gather, ~2M slots)
  F  full multi_layer_sample            (mask/bookkeeping on top of E)
  G  F + feature gather                 (input_nodes rows from the table)
  H  G + label gather + forward
  I  full fused train step              (fwd + bwd + adam)

plus standalone `rng both hops` (threefry uniforms alone).

Also prints a host-side frontier degree analysis sizing the degree-tiered
last hop: slot counts for candidate small-tier widths fB.

Usage: python tools/profile_primitive_budget.py [num_nodes] [steps]
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
from fgnn_tpu.ops.hashtable import unique_and_remap
from fgnn_tpu.ops.sampling import (
    _floyd_without_replacement,
    multi_layer_sample,
    sample_layer,
    take_1d_blocked,
)


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
    print(f"{name:44s} {per:9.3f} ms/iter", flush=True)
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
    f0, f1 = plan.fanouts
    DEDUP = False

    def key_of(i):
        return jax.random.fold_in(jax.random.key(0), i)

    # ---- host-side frontier degree analysis (tiered-hop sizing) --------
    indptr = np.asarray(ds.indptr)
    deg_all = np.diff(indptr).astype(np.int64)
    rng = np.random.default_rng(0)
    sd = np.asarray(seeds_np[:int(n)])
    # approx hop0 frontier: take min(deg, f0) neighbors per seed
    frontier_ids = []
    indices = np.asarray(ds.indices)
    for s in sd[:8000]:
        d = int(deg_all[s])
        if d == 0:
            continue
        k = min(d, f0)
        pick = rng.choice(d, size=k, replace=False)
        frontier_ids.append(indices[indptr[s]:indptr[s] + d][pick])
    fr = np.unique(np.concatenate([sd, np.concatenate(frontier_ids)]))
    fdeg = deg_all[fr]
    kv = np.minimum(fdeg, f1)
    V = len(fr)
    print(f"# frontier: {V} vertices, E[min(deg,{f1})]={kv.mean():.2f}, "
          f"valid slots {kv.sum()} / cap {plan.num_edge_cap[-1]} "
          f"(occupancy {kv.sum()/plan.num_edge_cap[-1]:.2f})")
    for fB in (4, 6, 8, 10, 12, 16):
        VA = int((fdeg > fB).sum())
        VB = V - VA
        slots = VA * f1 + VB * fB
        print(f"#   2-tier fB={fB:2d}: VA={VA} ({VA/V:.2f}) slots="
              f"{slots} ({slots/(V*f1):.2f} of V*f)")

    # ---- ladder --------------------------------------------------------
    res = {}

    def rng_only(i, _g):
        k = key_of(i)
        a = jax.random.uniform(jax.random.fold_in(k, 0),
                               (plan.num_input_cap[0], f0))
        b = jax.random.uniform(jax.random.fold_in(k, 1),
                               (plan.num_input_cap[1], f1))
        return jnp.sum(a) + jnp.sum(b)

    res["rng"] = scan_timer("rng both hops (standalone)", rng_only, steps, g)

    def A(i, g, s):
        nbr, valid, _ = sample_layer(jax.random.fold_in(key_of(i), 0), g, s,
                                     f0, cfg.sample_type)
        return jnp.sum(nbr) + jnp.sum(valid)

    res["A"] = scan_timer("A hop0 sample_layer", A, steps, g, seeds)

    def hop0_remap(i, g, s, n_):
        k = jax.random.fold_in(key_of(i), 0)
        nbr, valid, _ = sample_layer(k, g, s, f0, cfg.sample_type)
        uniq, nu, loc, ovf = unique_and_remap(
            s, n_, jnp.where(valid, nbr, -1), plan.num_unique_cap[0]
        )
        return jnp.sum(uniq) + jnp.sum(loc) + nu.astype(jnp.int32)

    res["B"] = scan_timer("B + hop0 remap", hop0_remap, steps, g, seeds, num)

    def frontier_of(i, g, s, n_):
        k = jax.random.fold_in(key_of(i), 0)
        nbr, valid, _ = sample_layer(k, g, s, f0, cfg.sample_type)
        uniq, nu, loc, ovf = unique_and_remap(
            s, n_, jnp.where(valid, nbr, -1), plan.num_unique_cap[0]
        )
        return uniq, nu, loc

    def C(i, g, s, n_):
        uniq, nu, loc = frontier_of(i, g, s, n_)
        ok = uniq >= 0
        safe = jnp.where(ok, uniq, 0)
        off = g.indptr[safe]
        deg = (g.indptr[safe + 1] - off).astype(jnp.int32)
        deg = jnp.where(ok, deg, 0)
        return jnp.sum(deg) + jnp.sum(loc) + jnp.sum(off).astype(jnp.float32)

    res["C"] = scan_timer("C + hop1 deg fetch", C, steps, g, seeds, num)

    def D(i, g, s, n_):
        uniq, nu, loc = frontier_of(i, g, s, n_)
        ok = uniq >= 0
        safe = jnp.where(ok, uniq, 0)
        off = g.indptr[safe]
        deg = (g.indptr[safe + 1] - off).astype(jnp.int32)
        deg = jnp.where(ok, deg, 0)
        k1 = jax.random.fold_in(key_of(i), 1)
        idx, valid = _floyd_without_replacement(k1, deg, f1)
        return jnp.sum(idx) + jnp.sum(valid) + jnp.sum(loc)

    res["D"] = scan_timer("D + hop1 Floyd picks", D, steps, g, seeds, num)

    def E(i, g, s, n_):
        uniq, nu, loc = frontier_of(i, g, s, n_)
        ok = uniq >= 0
        safe = jnp.where(ok, uniq, 0)
        off = g.indptr[safe]
        deg = (g.indptr[safe + 1] - off).astype(jnp.int32)
        deg = jnp.where(ok, deg, 0)
        k1 = jax.random.fold_in(key_of(i), 1)
        idx, valid = _floyd_without_replacement(k1, deg, f1)
        flat = off[:, None] + jnp.maximum(idx, 0).astype(off.dtype)
        flat = jnp.clip(flat, 0, g.indices.shape[0] - 1)
        nbr = take_1d_blocked(g.indices, flat.reshape(-1))
        return jnp.sum(nbr) + jnp.sum(valid) + jnp.sum(loc)

    res["E"] = scan_timer("E + hop1 CSR fetch", E, steps, g, seeds, num)

    def F(i, g, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        acc = jnp.sum(b.input_nodes) + jnp.sum(b.output_nodes)
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local) + jnp.sum(blk.dst_local)
        return acc

    res["F"] = scan_timer("F full multi_layer_sample", F, steps, g, seeds,
                          num)

    def G(i, g, f, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        acc = jnp.sum(device_gather(f, b.input_nodes))
        for blk in b.blocks:
            acc = acc + jnp.sum(blk.src_local).astype(jnp.float32)
        return acc

    res["G"] = scan_timer("G + feature gather", G, steps, g, feat, seeds,
                          num)

    def H(i, g, f, l, s, n_):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        feats = device_gather(f, b.input_nodes)
        logits = eng.model.apply(
            {"params": eng.state.params}, b, feats, eng.dst_caps,
            deterministic=True,
        )
        return jnp.sum(logits)

    res["H"] = scan_timer("H + forward", H, steps, g, feat, label, seeds,
                          num)

    from fgnn_tpu.train.loop import make_train_step

    step_fn = make_train_step(eng.model, eng.tx, eng.dst_caps,
                              cfg.batch_size)
    state0 = eng.state

    def I(i, g, f, l, s, n_, st):
        b = multi_layer_sample(key_of(i), g, s, n_, plan, cfg.sample_type,
                               dedup_last_hop=DEDUP)
        feats = device_gather(f, b.input_nodes)
        labels = label_gather(l, b.output_nodes)
        st2, loss, acc = step_fn(st, b, feats, labels, key_of(i))
        return loss

    res["I"] = scan_timer("I full fused step", I, steps, g, feat, label,
                          seeds, num, state0)

    print("\n# primitive budget (ms/step):")
    print(f"#   rng (standalone)        {res['rng']:7.2f}")
    print(f"#   hop0 sample (A)         {res['A']:7.2f}")
    print(f"#   hop0 remap (B-A)        {res['B'] - res['A']:7.2f}")
    print(f"#   hop1 deg fetch (C-B)    {res['C'] - res['B']:7.2f}")
    print(f"#   hop1 picks (D-C)        {res['D'] - res['C']:7.2f}")
    print(f"#   hop1 CSR fetch (E-D)    {res['E'] - res['D']:7.2f}")
    print(f"#   bookkeeping (F-E)       {res['F'] - res['E']:7.2f}")
    print(f"#   feature gather (G-F)    {res['G'] - res['F']:7.2f}")
    print(f"#   forward (H-G)           {res['H'] - res['G']:7.2f}")
    print(f"#   bwd+adam (I-H)          {res['I'] - res['H']:7.2f}")
    print(f"#   TOTAL fused step (I)    {res['I']:7.2f}")


if __name__ == "__main__":
    main()
