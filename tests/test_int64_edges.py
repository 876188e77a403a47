""">2^31-edge (int64 indptr) execution (VERDICT r2 item 7).

The reference handles UK's 3B edges by switching to ``*64.bin`` dataset
files (engine.cc:73-264, utility 32to64.cc). Our analog: int64 indptr +
``jax_enable_x64``; ``OneChipEngine``/``_put_graph`` raise without x64
(the silent int32 downcast would corrupt neighbor offsets).

This test builds a synthetic whose indptr genuinely exceeds 2^31 without
paying 8.6GB of disk: vertex 0 owns a 2^31-edge range backed by a SPARSE
memmap file (holes read as zeros = node 0, a valid id), and the training
vertices own real edge ranges ABOVE offset 2^31 — every sampled training
hop gathers from >2^31 offsets. Runs in a subprocess so the x64 flag
can't leak into other tests.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import sys
import numpy as np

from fgnn_tpu.config import RunConfig, SampleType
from fgnn_tpu.data.schema import Dataset

path = sys.argv[1]

NUM_NODE = 1000
N_TRAIN = 64
DEG_TAIL = 128
HUGE = 2**31                      # vertex 0's degree
NUM_EDGE = HUGE + N_TRAIN * DEG_TAIL
assert NUM_EDGE % 128 == 0        # lane-aligned: no pad copy of 8.6GB

# sparse file: only the tail region is materialized
idx = np.memmap(path, dtype=np.int32, mode="w+", shape=(NUM_EDGE,))
rng = np.random.default_rng(0)
tail = rng.integers(1, N_TRAIN + 1, size=N_TRAIN * DEG_TAIL,
                    dtype=np.int32)
idx[HUGE:] = tail                 # train vertices' neighbors live >2^31
idx.flush()

indptr = np.zeros(NUM_NODE + 1, dtype=np.int64)
indptr[1] = HUGE                  # vertex 0: 2^31 edges (all zeros->node 0)
for v in range(1, N_TRAIN + 1):
    indptr[v + 1] = indptr[v] + DEG_TAIL
indptr[N_TRAIN + 2:] = indptr[N_TRAIN + 1]

ds = Dataset(
    name="int64-edges", num_node=NUM_NODE, num_edge=NUM_EDGE, num_class=4,
    indptr=indptr,
    indices=np.memmap(path, dtype=np.int32, mode="r", shape=(NUM_EDGE,)),
    feat=rng.standard_normal((NUM_NODE, 8), dtype=np.float32),
    label=rng.integers(0, 4, NUM_NODE).astype(np.int32),
    train_set=np.arange(1, N_TRAIN + 1, dtype=np.int32),
    test_set=np.arange(1, 9, dtype=np.int32),
    valid_set=np.arange(1, 9, dtype=np.int32),
)
# (skip ds.validate(): indices.max() would stream the whole 8.6GB mmap)

cfg = RunConfig(model="graphsage", fanout=(4, 4), batch_size=32,
                num_hidden=16, sample_type=SampleType.KHOP0,
                dropout=0.0, lr=0.01)

from fgnn_tpu.engine import OneChipEngine

# guard direction: without x64 the engine must refuse (int32 downcast
# would corrupt offsets)
try:
    OneChipEngine(cfg, ds)
    raise SystemExit("guard failed: engine accepted >2^31 edges w/o x64")
except ValueError as e:
    assert "2^31" in str(e), e
    print("guard ok:", e)

# execution direction: enable x64, sample from >2^31 offsets, train
jax.config.update("jax_enable_x64", True)
eng = OneChipEngine(cfg, ds)
r = eng.run_epoch(0)
assert np.isfinite(r["loss"]), r
# every sampled edge of every training hop lives at an offset >= 2^31;
# nonzero sampled_edges means the int64 offset arithmetic + gather worked
assert r["sampled_edges"] > 0, r
print("int64 epoch ok:", {k: r[k] for k in ("loss", "sampled_edges")})
"""


@pytest.mark.slow
def test_int64_indptr_guard_and_execution(tmp_path):
    script = tmp_path / "run_int64.py"
    script.write_text(SCRIPT)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "indices.bin")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "guard ok" in r.stdout
    assert "int64 epoch ok" in r.stdout
