"""Region-row neighbor fetch matches the direct blocked gather exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fgnn_tpu.ops.sampling as S
from fgnn_tpu.ops.sampling import CSRGraph, _region_select


def _graph(seed, N=3000, hub_every=89):
    rng = np.random.default_rng(seed)
    deg = rng.integers(1, 40, N)
    deg[::hub_every] = rng.integers(300, 2000, len(deg[::hub_every]))
    indptr = np.zeros(N + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    E = int(indptr[-1])
    indices = rng.integers(0, N, E).astype(np.int32)
    pad = (-E) % S.INDICES_LANE
    g = CSRGraph(indptr=jnp.asarray(indptr),
                 indices=jnp.asarray(np.pad(indices, (0, pad))))
    return g, indptr, indices, deg


@pytest.mark.parametrize("seed", [0, 1])
def test_region_select_exact(seed):
    g, indptr, indices, deg = _graph(seed)
    rng = np.random.default_rng(seed + 100)
    V, F = 256, 10
    vs = rng.integers(0, len(deg), V)
    off = indptr[vs]
    dg = deg[vs].astype(np.int32)
    idx = np.minimum(
        rng.integers(0, 2000, (V, F)), dg[:, None] - 1
    ).astype(np.int32)
    idx[rng.random((V, F)) < 0.15] = -1
    out, ok, ovf = jax.jit(_region_select)(
        g.indices, jnp.asarray(off), jnp.asarray(dg), jnp.asarray(idx)
    )
    out, ok = np.asarray(out), np.asarray(ok)
    assert not bool(ovf), "HCAP must cover this frontier"
    assert ok.all()
    ref = indices[off[:, None] + np.maximum(idx, 0)]
    valid = idx >= 0
    np.testing.assert_array_equal(out[valid], ref[valid])


def test_region_select_hcap_overflow_flags():
    """More wide-range vertices than HCAP slots -> clipped + flagged."""
    g, indptr, indices, deg = _graph(2, N=512, hub_every=2)
    # frontier made entirely of hub vertices: n_high >> HCAP = V//frac
    vs = np.arange(0, 512, 2)[:64]
    off = indptr[vs]
    dg = deg[vs].astype(np.int32)
    rng = np.random.default_rng(0)
    idx = (rng.integers(0, 1 << 30, (64, 4)) % dg[:, None]).astype(np.int32)
    out, ok, ovf = jax.jit(_region_select)(
        g.indices, jnp.asarray(off), jnp.asarray(dg), jnp.asarray(idx)
    )
    out, ok = np.asarray(out), np.asarray(ok)
    assert bool(ovf)
    # served vertices are still exact
    ref = indices[off[:, None] + np.maximum(idx, 0)]
    np.testing.assert_array_equal(out[ok], ref[ok])
    assert (~ok).any()


def test_sample_layer_identical_with_and_without_region(monkeypatch):
    from fgnn_tpu.ops.sampling import sample_layer
    from fgnn_tpu.config import SampleType

    g, *_ = _graph(7)
    seeds = jnp.asarray(
        np.random.default_rng(3).integers(0, 2999, 128).astype(np.int32)
    )
    key = jax.random.key(11)
    monkeypatch.setattr(S, "REGION_FETCH", True)
    a = jax.jit(lambda k, s: sample_layer(k, g, s, 8, SampleType.KHOP0))(
        key, seeds
    )
    monkeypatch.setattr(S, "REGION_FETCH", False)
    b = jax.jit(lambda k, s: sample_layer(k, g, s, 8, SampleType.KHOP0))(
        key, seeds
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert not bool(a[2]) and not bool(b[2])
