"""FGNN (arch5) factored training ACROSS HOSTS — the multihost flagship.

Host roles over DCN: processes [0, --num-sampler-hosts) dedicate all their
chips to sampling; the rest train with gradient all-reduce spanning
trainer hosts. Reference: dist_engine.cc:231-465 role init +
operation.cc:343-355 (sample_init/train_init per process), generalized
from fork+shared-memory to jax.distributed.

Launch one process per host:

  FGNN_TPU_COORDINATOR=h0:29777 FGNN_TPU_NUM_PROCESSES=2 \
  FGNN_TPU_PROCESS_ID=<i> python examples/train_factored_multihost.py

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
    p.add_argument("--num-sampler-hosts", type=int, default=1)
    p.add_argument("--cache-percentage", type=float, default=0.0)
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fgnn_tpu.parallel import multihost as mh

    assert mh.initialize_from_env(), (
        "set FGNN_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID"
    )

    import numpy as np

    from fgnn_tpu.config import CachePolicy, RunConfig, SampleType
    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.parallel.factored_multihost import MultihostFactoredEngine
    from fgnn_tpu.utils.logging import log_test_result

    cfg = RunConfig(
        model="graphsage", fanout=(4, 4), batch_size=args.batch_size,
        num_hidden=args.num_hidden, sample_type=SampleType.KHOP0,
        dropout=0.0, lr=0.01,
        num_sample_worker=1, num_train_worker=1,  # roles come from hosts
        cache_policy=(CachePolicy.PRESAMPLE if args.cache_percentage > 0
                      else CachePolicy.DEGREE),
        cache_percentage=args.cache_percentage,
        presample_epoch=1,
    )
    # every host maps the same dataset files (here: same synthetic seed)
    ds = make_synthetic_dataset(
        num_node=args.synthetic_nodes, avg_degree=10, feat_dim=32,
        num_class=8, seed=5,
    )
    eng = MultihostFactoredEngine(
        cfg, ds, num_sampler_hosts=args.num_sampler_hosts,
    )
    for epoch in range(args.num_epoch):
        r = eng.run_epoch(epoch)
        print(f"proc {eng.proc} ({r['role']}) epoch {epoch}: "
              f"loss={r['loss']:.6f} time={r['epoch_time']:.2f}s",
              flush=True)
        if r["role"] == "trainer":
            log_test_result(f"epoch{epoch}_loss", f"{r['loss']:.8f}")
            log_test_result(f"epoch{epoch}_acc", f"{r['acc']:.8f}")
    if not eng.is_sampler_host:
        import jax.numpy as jnp

        flat = jax.tree.leaves(jax.device_get(jax.tree.map(
            lambda x: jnp.sum(jnp.abs(x)), eng.state.params)))
        log_test_result("param_checksum",
                        f"{float(np.sum([float(x) for x in flat])):.6f}")
    mh.barrier("factored-done")
    print(f"proc {eng.proc} done", flush=True)


if __name__ == "__main__":
    main()
