"""Multihost (DCN) data-parallel training demo.

The cross-host generalization of the SGNN loop: every host samples its
contiguous shard of the identically-shuffled train set
(dist_shuffler.cc:112-117 semantics), batches assemble into ONE globally
sharded wave per step, and the jitted train wave's gradient mean runs as
a psum across every chip of every pod slice (DCN between hosts, inserted
by XLA from the sharding — no NCCL choreography).

Also exercises the multihost presample flow: host 0 ranks nodes by a real
presample epoch and broadcasts the ranking (shared-mmap ranking analog,
dist_engine.cc:115-127).

Launch one process per host:

  FGNN_TPU_COORDINATOR=h0:29777 FGNN_TPU_NUM_PROCESSES=2 \
  FGNN_TPU_PROCESS_ID=<i> python examples/train_multihost.py [--smoke]

--smoke: CPU platform, tiny graph (the 2-process dryrun used by tests).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="CPU 2-process dryrun")
    p.add_argument("--synthetic-nodes", type=int, default=20_000)
    p.add_argument("--num-epoch", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-hidden", type=int, default=32)
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fgnn_tpu.parallel import multihost as mh

    assert mh.initialize_from_env(), (
        "set FGNN_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID"
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.host_engine import np_multi_layer_sample
    from fgnn_tpu.models import build_model
    from fgnn_tpu.ops.padding import make_plan
    from fgnn_tpu.ops.reference_impl import calibrate_caps
    from fgnn_tpu.parallel.shuffler import DistShuffler
    from fgnn_tpu.train.loop import (
        TrainState, create_train_state, masked_cross_entropy,
    )
    from fgnn_tpu.utils.logging import log_test_result
    import optax

    host, nhosts = jax.process_index(), jax.process_count()
    mesh = mh.global_data_mesh()
    W = len(jax.devices())            # global wave width (1 batch/chip)
    n_local = len(jax.local_devices())
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    cfg = RunConfig(model="graphsage", fanout=(4, 4),
                    batch_size=args.batch_size,
                    num_hidden=args.num_hidden,
                    sample_type=SampleType.KHOP0, dropout=0.0, lr=0.01)
    # every host builds the SAME dataset (stand-in for each host mmapping
    # the same dataset files)
    ds = make_synthetic_dataset(num_node=args.synthetic_nodes,
                                avg_degree=10, feat_dim=32, num_class=8,
                                seed=5)
    indptr, indices = np.asarray(ds.indptr), np.asarray(ds.indices)
    caps = calibrate_caps(indptr, indices, np.asarray(ds.train_set),
                          cfg.batch_size, list(reversed(cfg.fanout)),
                          num_probe=2, seed=cfg.seed)
    plan = make_plan(cfg.batch_size, cfg.fanout, ds.num_node,
                     unique_caps=caps)
    dst_caps = tuple(reversed(plan.num_input_cap))
    B = cfg.batch_size

    # --- multihost presample: host 0 ranks, everyone receives ----------
    rng = np.random.default_rng(cfg.seed + host)
    probe_shuffler = DistShuffler(np.asarray(ds.train_set), B,
                                  plan.num_input_cap[0], 0, 1,
                                  base_seed=cfg.seed)
    if host == 0:
        freq = np.zeros(ds.num_node, np.int64)
        for seeds, n, _ in probe_shuffler.batches(0):
            b = np_multi_layer_sample(rng, indptr, indices, seeds, n, plan)
            ids = np.asarray(b.input_nodes)
            np.add.at(freq, ids[ids >= 0], 1)
        ranking = np.argsort(-freq, kind="stable").astype(np.int32)
    else:
        ranking = np.zeros(ds.num_node, np.int32)
    ranking = mh.broadcast_from_host0(ranking)
    log_test_result("ranking_checksum", str(int(ranking[:100].sum())))
    mh.barrier("post-presample")

    # --- model/state (same seed everywhere -> identical params) --------
    model = build_model(cfg.model, ds.feat_dim, cfg.num_hidden,
                        ds.num_class, plan.num_layer, cfg.dropout)
    seeds0, n0, _ = next(probe_shuffler.batches(0))
    b0 = np_multi_layer_sample(np.random.default_rng(0), indptr, indices,
                               seeds0, n0, plan)
    f0 = np.asarray(ds.feat)[np.maximum(np.asarray(b0.input_nodes), 0)]
    state, tx = create_train_state(model, jax.random.key(cfg.seed + 1),
                                   b0, jnp.asarray(f0), dst_caps,
                                   lr=cfg.lr)
    state = jax.device_put(state, repl)

    def train_wave(state, batches, feats, labels, keys, nums):
        def loss_fn(params):
            def one(b, f, l, k, n):
                logits = model.apply(
                    {"params": params}, b, f, dst_caps,
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(
                        jax.random.key(k), 7)},
                )
                loss, acc = masked_cross_entropy(logits[:B], l[:B])
                w = (n > 0).astype(jnp.float32)
                return loss * w, acc * w, w

            ls, accs, ws = jax.vmap(one)(batches, feats, labels, keys, nums)
            wsum = jnp.maximum(ws.sum(), 1.0)
            return ls.sum() / wsum, accs.sum() / wsum

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(params=new_params, opt_state=new_opt,
                       step=state.step + 1),
            loss, acc,
        )

    wave_g = jax.jit(train_wave,
                     in_shardings=(repl, shard, shard, shard, shard, shard),
                     out_shardings=(repl, repl, repl),
                     donate_argnums=(0,))

    # each host owns W/nhosts wave slots; slot (host, j) takes global
    # step  wave*W + host*n_local + j  of the shared permutation
    shuf = DistShuffler(np.asarray(ds.train_set), B,
                        plan.num_input_cap[0], 0, 1, base_seed=cfg.seed)
    num_waves = -(-shuf.num_step // W)
    feat_np = np.asarray(ds.feat)
    label_np = np.asarray(ds.label)

    for epoch in range(args.num_epoch):
        perm = shuf.epoch_permutation(epoch)
        losses = []
        for wv in range(num_waves):
            batches, feats, labels, keys, nums = [], [], [], [], []
            for j in range(n_local):
                gstep = wv * W + host * n_local + j
                lo = gstep * B
                seeds = np.full(plan.num_input_cap[0], -1, np.int32)
                n = max(0, min(B, len(perm) - lo))
                if n > 0:
                    seeds[:n] = perm[lo:lo + n]
                b = np_multi_layer_sample(rng, indptr, indices, seeds,
                                          n, plan)
                batches.append(jax.tree.map(np.asarray, b))
                ids = np.maximum(np.asarray(b.input_nodes), 0)
                feats.append(feat_np[ids])
                out = np.asarray(b.output_nodes)
                labels.append(np.where(out >= 0,
                                       label_np[np.maximum(out, 0)], -1))
                keys.append(
                    np.uint32(cfg.seed * 7 + epoch * 100003 + gstep)
                )
                nums.append(np.int32(n))
            local_stack = (
                jax.tree.map(lambda *xs: np.stack(xs), *batches),
                np.stack(feats), np.stack(labels), np.stack(keys),
                np.stack(nums),
            )
            gbatch, gfeat, glab, gkey, gnum = jax.tree.map(
                lambda a: mh.host_local_to_global(a, mesh, P("data")),
                local_stack,
                is_leaf=lambda x: isinstance(x, np.ndarray),
            )
            state, loss, acc = wave_g(state, gbatch, gfeat, glab, gkey,
                                      gnum)
            losses.append(float(loss))
        print(f"host {host} epoch {epoch}: loss={np.mean(losses):.4f}",
              flush=True)
        log_test_result(f"epoch{epoch}_loss", f"{np.mean(losses):.6f}")

    # params must be bit-identical across hosts (replicated psum state)
    flat = jax.tree.leaves(jax.device_get(
        jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), state.params)
    ))
    checksum = float(np.sum([float(x) for x in flat]))
    log_test_result("param_checksum", f"{checksum:.6f}")
    mh.barrier("done")
    print(f"host {host} done, param_checksum={checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
