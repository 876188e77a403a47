"""Stage-by-stage TPU timing: where does the fused step spend time?

Usage: python tools/profile_stages.py [num_nodes]
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
from fgnn_tpu.ops.extract import device_gather
from fgnn_tpu.ops.hashtable import unique_with_seeds, lookup_local_ids
from fgnn_tpu.ops.sampling import sample_layer, multi_layer_sample


from tools.tpu_timing import timed as _timed


def timed(name, fn, *args, n=5):
    _, out = _timed(name, fn, *args, n=n, inner=2)
    return out


def main():
    num_node = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    ds = make_synthetic_dataset(num_node=num_node, avg_degree=15,
                                feat_dim=128, num_class=64,
                                train_frac=0.05, seed=0)
    cfg = RunConfig(model="graphsage", fanout=(25, 10), batch_size=8000,
                    num_hidden=256, sample_type=SampleType.KHOP2,
                    dropout=0.5)
    eng = OneChipEngine(cfg, ds)
    plan = eng.plan
    print("plan:", plan)
    g = eng.graph
    seeds_np, n, _ = next(eng.shuffler.batches(0))
    seeds = jnp.asarray(seeds_np)
    num = jnp.int32(n)
    key = jax.random.key(0)

    # hop-by-hop
    f0 = plan.fanouts[0]
    samp0 = jax.jit(lambda k, s: sample_layer(k, g, s, f0, cfg.sample_type))
    nbrs, valid, _ovf = timed("hop0 sample_layer", samp0, key, seeds)

    uniq0 = jax.jit(
        lambda s, nn, nb: unique_with_seeds(s, nn, nb, plan.num_unique_cap[0])
    )
    unique, nu, _ = timed("hop0 unique_with_seeds", uniq0, seeds, num, nbrs)

    remap0 = jax.jit(
        lambda u, nb: lookup_local_ids(u, plan.num_input_cap[0], nb)
    )
    timed("hop0 lookup_local_ids", remap0, unique, nbrs)

    f1 = plan.fanouts[1]
    samp1 = jax.jit(lambda k, s: sample_layer(k, g, s, f1, cfg.sample_type))
    nbrs1, _, _ovf1 = timed("hop1 sample_layer", samp1, key, unique)
    uniq1 = jax.jit(
        lambda s, nn, nb: unique_with_seeds(s, nn, nb, plan.num_unique_cap[1])
    )
    unique1, nu1, _ = timed("hop1 unique_with_seeds", uniq1, unique, nu, nbrs1)
    remap1 = jax.jit(
        lambda u, nb: lookup_local_ids(u, plan.num_input_cap[1], nb)
    )
    timed("hop1 lookup_local_ids", remap1, unique1, nbrs1)

    # full sample
    full = jax.jit(
        lambda k, s, nn: multi_layer_sample(k, g, s, nn, plan, cfg.sample_type)
    )
    batch = timed("multi_layer_sample (full)", full, key, seeds, num)

    # extract
    ext = jax.jit(lambda ids: device_gather(eng.feat_dev, ids))
    feats = timed("feature gather", ext, batch.input_nodes)

    # fused step (state is donated -> rebind each call)
    state = eng.state
    from tools.tpu_timing import sync
    state, loss, acc, ni, ovf = eng.fused_step(state, key, seeds, num)
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        state, loss, acc, ni, ovf = eng.fused_step(state, key, seeds, num)
    sync(loss)
    print(f"{'fused train step':36s} {(time.perf_counter()-t0)/3*1e3:9.2f} ms")
    print("num_input:", int(batch.num_input))


if __name__ == "__main__":
    main()
