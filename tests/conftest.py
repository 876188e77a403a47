"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run on
XLA's host-platform device emulation (SURVEY.md §4 implication).
Must run before jax is imported anywhere.
"""
import os

# The shell presets JAX_PLATFORMS=axon (real TPU tunnel) AND preloads jax
# at interpreter startup, so the env var is already captured in jax.config —
# override via config.update, not os.environ. XLA_FLAGS is read lazily at
# first backend init, so setting it here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 8 virtual devices on few physical cores starves collective
    # rendezvous under load; raise XLA CPU's 40s hard-kill so heavy
    # wave tests can't be terminated by scheduler skew
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()

if not os.environ.get("FGNN_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Test lanes (round-3 verdict Weak #6): the full suite exceeds a 10-min CI
# window because of XLA CPU-mesh compiles. Modules that build multi-device
# engines (factored/SGNN/switcher waves, checkpoint roundtrips, whole-epoch
# fused programs) are auto-marked `mesh`; everything else is `fast`.
#   pytest -m fast        -> core lane (ops, cache, policy, session), <5 min
#   pytest -m "mesh or slow" -> the heavy lane
_MESH_MODULES = {
    "test_switcher_async", "test_factored", "test_factored_cache",
    "test_multihost", "test_arch_matrix", "test_checkpoint",
    "test_pipelined_epoch", "test_overflow", "test_three_layer",
    "test_end_to_end", "test_profile_levels", "test_exp_runner",
    "test_int64_edges", "test_dynamic_cache", "test_presample_static",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.fspath.purebasename
        if mod in _MESH_MODULES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.mesh)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def small_ds():
    from fgnn_tpu.data import make_synthetic_dataset

    return make_synthetic_dataset(num_node=2000, avg_degree=8, feat_dim=32,
                                  num_class=8, seed=42)


@pytest.fixture(scope="session")
def tiny_graph():
    """Hand-checkable CSR graph."""
    indptr = np.array([0, 3, 5, 5, 9, 10], dtype=np.int64)
    indices = np.array([1, 2, 3, 0, 4, 0, 1, 2, 4, 3], dtype=np.int32)
    return indptr, indices
