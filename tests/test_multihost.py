"""Multihost (DCN) skeleton: 2-process CPU dryrun.

Spawns two jax.distributed processes (Gloo CPU backend) running the
multihost data-parallel demo; asserts the presample-ranking broadcast
matches, losses are identical, and the replicated train state stays
bit-identical across hosts (the psum-over-DCN contract). Reference
analogs: dist_engine.cc:115-127 (shared-mmap ranking) + torch DDP NCCL
all-reduce (train_gcn.py:223-242).
"""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    port = 29909
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            FGNN_TPU_COORDINATOR=f"127.0.0.1:{port}",
            FGNN_TPU_NUM_PROCESSES="2",
            FGNN_TPU_PROCESS_ID=str(i),
            PYTHONPATH=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "examples", "train_multihost.py"),
             "--smoke", "--synthetic-nodes", "8000"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        ))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    vals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out[-3000:]}"
        got = dict(re.findall(r"test_result:([^=]+)=(\S+)", out))
        assert "param_checksum" in got, out[-2000:]
        vals.append(got)
    # ranking broadcast + replicated state identical across hosts
    assert vals[0]["ranking_checksum"] == vals[1]["ranking_checksum"]
    assert vals[0]["param_checksum"] == vals[1]["param_checksum"]
    assert vals[0]["epoch0_loss"] == vals[1]["epoch0_loss"]
    # training moves: loss decreases
    assert float(vals[0]["epoch1_loss"]) < float(vals[0]["epoch0_loss"])
