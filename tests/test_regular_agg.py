"""Regular-block (reshape) aggregation must match the general segment path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.models.aggregate import (
    in_degrees,
    segment_agg,
    segment_softmax,
)
from fgnn_tpu.ops.sampling import Block


def _make_regular_block(seed, dst_cap=16, K=5):
    rng = np.random.default_rng(seed)
    E = dst_cap * K
    mask = rng.random(E) < 0.7
    src = np.where(mask, rng.integers(0, 40, E), -1).astype(np.int32)
    dst = np.repeat(np.arange(dst_cap, dtype=np.int32), K)
    dst = np.where(mask, dst, -1).astype(np.int32)
    w = np.where(mask, rng.random(E).astype(np.float32), 0.0)
    return Block(
        src_local=jnp.asarray(src), dst_local=jnp.asarray(dst),
        mask=jnp.asarray(mask), num_src=jnp.int32(40),
        num_dst=jnp.int32(dst_cap), weights=jnp.asarray(w),
        slots_per_dst=K,
    )


@pytest.mark.parametrize("mode", ["sum", "mean", "weighted_mean"])
def test_segment_agg_regular_matches_general(mode):
    blk = _make_regular_block(0)
    dst_cap = 16
    msgs = jnp.asarray(
        np.random.default_rng(1).random((16 * 5, 8)).astype(np.float32)
    )
    kw = {}
    if mode == "weighted_mean":
        kw["edge_weights"] = blk.weights
    fast = segment_agg(msgs, blk, dst_cap, mode=mode, **kw)
    general = segment_agg(
        msgs, dataclasses.replace(blk, slots_per_dst=None), dst_cap,
        mode=mode, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(general), rtol=1e-5, atol=1e-6
    )


def test_segment_softmax_regular_matches_general():
    blk = _make_regular_block(2)
    scores = jnp.asarray(
        np.random.default_rng(3).normal(size=(16 * 5, 4)).astype(np.float32)
    )
    fast = segment_softmax(scores, blk, 16)
    general = segment_softmax(
        scores, dataclasses.replace(blk, slots_per_dst=None), 16
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(general), rtol=1e-5, atol=1e-6
    )


def test_in_degrees_regular_matches_general():
    blk = _make_regular_block(4)
    fast = in_degrees(blk, 16)
    general = in_degrees(dataclasses.replace(blk, slots_per_dst=None), 16)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(general))
