"""Pin table6's init:copy column against tunnel noise.

The table6 init:copy placement is IDENTICAL for every cache policy at
FEAT_HBM_BUDGET=0: graph topology (indptr+indices) + labels go to HBM,
features stay host. Round 4 measured 13.9 / 451 / 745 / 94 s for the
same placement across the four policy rows — pure tunnel variance. This
probe times exactly that placement set N times in one process and
reports min/median/max, giving the artifact a defensible
"true placement cost" line without re-running 4 policies x 2 epochs
(~50 min of chip time) for what is a ~60 MB h2d transfer.

Usage: python tools/probe_init_copy.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fgnn_tpu.data.synthetic import make_synthetic_dataset


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ds = make_synthetic_dataset(num_node=1_000_000, avg_degree=15,
                                feat_dim=128, num_class=64, seed=0,
                                neighbor_skew=6.0, neighbor_pref=0.5)
    indptr = np.asarray(ds.indptr, dtype=np.int32)
    indices = np.asarray(ds.indices)
    label = np.asarray(ds.label)
    mb = (indptr.nbytes + indices.nbytes + label.nbytes) / 1e6
    print(f"# placement set: {mb:.1f} MB "
          f"(indptr {indptr.nbytes >> 20}MB, indices {indices.nbytes >> 20}MB, "
          f"labels {label.nbytes >> 20}MB), device {jax.devices()[0]}")
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        a = jnp.asarray(indptr)
        b = jnp.asarray(indices)
        c = jnp.asarray(label)
        jax.block_until_ready((a, b, c))
        dt = time.perf_counter() - t0
        ts.append(dt)
        print(f"rep {i}: {dt:.3f} s ({mb / dt:.1f} MB/s)")
        del a, b, c
    ts.sort()
    print(f"# init:copy placement min={ts[0]:.3f}s "
          f"median={ts[len(ts) // 2]:.3f}s max={ts[-1]:.3f}s over {reps} reps")


if __name__ == "__main__":
    main()
