"""Blocked 1D gather equivalence across lane widths."""
import jax.numpy as jnp
import numpy as np
import pytest

import fgnn_tpu.ops.sampling as S


@pytest.mark.parametrize("lane", [8, 32, 128])
def test_take_1d_blocked_matches_take(monkeypatch, lane):
    monkeypatch.setattr(S, "INDICES_LANE", lane)
    rng = np.random.default_rng(lane)
    n = 4096   # multiple of all lanes
    table = rng.integers(0, 1 << 30, n).astype(np.int32)
    idx = rng.integers(0, n, 1000).astype(np.int32)
    out = S.take_1d_blocked(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_take_1d_blocked_unaligned_falls_back(monkeypatch):
    monkeypatch.setattr(S, "INDICES_LANE", 32)
    table = np.arange(100, dtype=np.int32)   # not a multiple of 32
    idx = np.asarray([0, 50, 99], np.int32)
    out = S.take_1d_blocked(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_take_1d_blocked_f32():
    rng = np.random.default_rng(0)
    n = 1024
    table = rng.random(n).astype(np.float32)
    idx = rng.integers(0, n, 500).astype(np.int32)
    out = S.take_1d_blocked(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out), table[idx])
