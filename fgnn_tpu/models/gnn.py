"""GNN model zoo — Flax modules over padded COO blocks.

Parity targets (reference model definitions):
  * GCN: stack of DGL GraphConv, ReLU, dropout between layers
    (example/samgraph/multi_gpu/train_gcn.py:18-46).
  * GraphSAGE: mean-aggregator SAGEConv stack
    (example/samgraph/multi_gpu/train_graphsage.py).
  * PinSAGE: WeightedSAGEConv with random-walk visit counts as edge
    weights and L2-normalized output
    (example/samgraph/balance_switcher/train_pinsage.py:32-97).
  * GAT: multi-head GATConv stack, ELU (example/samgraph/train_gat.py).

Each layer consumes one sampled Block (input-side first, matching DGL block
order, torch/adapter.py:99-118) and the full src-space feature matrix
``h`` [src_cap, D]; destination features are the prefix ``h[:dst_cap]``
(seeds-first invariant of the sampler's renumbering).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import Block, SampledBatch
from .aggregate import (
    gather_src,
    in_degrees,
    out_degrees,
    segment_agg,
    segment_softmax,
)


class GraphConv(nn.Module):
    """DGL GraphConv, norm='both', allow_zero_in_degree."""

    out_dim: int
    activation: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, block: Block, h: jnp.ndarray, dst_cap: int) -> jnp.ndarray:
        src_cap = h.shape[0]
        h = nn.Dense(self.out_dim, use_bias=False, name="weight", dtype=self.dtype)(h)
        deg_out = out_degrees(block, src_cap)
        h = h * jax.lax.rsqrt(jnp.maximum(deg_out, 1.0))[:, None]
        msgs = gather_src(h, block)
        agg = segment_agg(msgs, block, dst_cap, mode="sum")
        deg_in = in_degrees(block, dst_cap)
        agg = agg * jax.lax.rsqrt(jnp.maximum(deg_in, 1.0))[:, None]
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        agg = agg + bias
        if self.activation is not None:
            agg = self.activation(agg)
        return agg


class SAGEConv(nn.Module):
    """DGL SAGEConv with 'mean' aggregator."""

    out_dim: int
    activation: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, block: Block, h: jnp.ndarray, dst_cap: int) -> jnp.ndarray:
        h_dst = h[:dst_cap]
        msgs = gather_src(h, block)
        agg = segment_agg(msgs, block, dst_cap, mode="mean")
        out = nn.Dense(self.out_dim, name="fc_self", dtype=self.dtype)(h_dst) + nn.Dense(
            self.out_dim, use_bias=False, name="fc_neigh", dtype=self.dtype
        )(agg)
        if self.activation is not None:
            out = self.activation(out)
        return out


class WeightedSAGEConv(nn.Module):
    """PinSAGE conv (balance_switcher/train_pinsage.py:32-65)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.5
    activation: Callable = jax.nn.relu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        block: Block,
        h: jnp.ndarray,
        dst_cap: int,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert block.weights is not None, "PinSAGE requires edge weights"
        h_dst = h[:dst_cap]
        n = self.activation(
            nn.Dense(self.hidden_dim, name="Q", dtype=self.dtype)(
                nn.Dropout(self.dropout, deterministic=deterministic)(h)
            )
        )
        msgs = gather_src(n, block)
        agg = segment_agg(
            msgs, block, dst_cap, mode="weighted_mean", edge_weights=block.weights
        )
        z = self.activation(
            nn.Dense(self.out_dim, name="W", dtype=self.dtype)(
                nn.Dropout(self.dropout, deterministic=deterministic)(
                    jnp.concatenate([agg, h_dst], axis=1)
                )
            )
        )
        z_norm = jnp.linalg.norm(z, axis=1, keepdims=True)
        z_norm = jnp.where(z_norm == 0.0, 1.0, z_norm)
        return z / z_norm


class GATConv(nn.Module):
    """DGL GATConv: multi-head additive attention."""

    out_dim: int
    num_heads: int
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    activation: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        block: Block,
        h: jnp.ndarray,
        dst_cap: int,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        H, D = self.num_heads, self.out_dim
        feat = nn.Dense(H * D, use_bias=False, name="fc", dtype=self.dtype)(h).reshape(-1, H, D)
        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(), (1, H, D))
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(), (1, H, D))
        el = jnp.sum(feat * attn_l, axis=-1)  # [src_cap, H]
        er = jnp.sum(feat * attn_r, axis=-1)
        src = jnp.maximum(block.src_local, 0)
        dstl = jnp.maximum(block.dst_local, 0)
        e = jax.nn.leaky_relu(
            el[src] + er[:dst_cap][jnp.minimum(dstl, dst_cap - 1)],
            self.negative_slope,
        )  # [E_cap, H]
        alpha = segment_softmax(e, block, dst_cap)
        alpha = nn.Dropout(self.attn_drop, deterministic=deterministic)(alpha)
        msgs = feat[src] * alpha[:, :, None]  # [E_cap, H, D]
        out = segment_agg(
            msgs.reshape(msgs.shape[0], H * D), block, dst_cap, mode="sum"
        ).reshape(dst_cap, H, D)
        if self.activation is not None:
            out = self.activation(out)
        return out


# ---------------------------------------------------------------------------
# Full models
# ---------------------------------------------------------------------------

class GCN(nn.Module):
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int
    dropout: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: SampledBatch, feats, dst_caps, *, deterministic=True):
        h = feats if self.dtype is None else feats.astype(self.dtype)
        dims = (
            [self.hidden_dim] * (self.num_layers - 1) + [self.num_classes]
        )
        for i, (block, dim) in enumerate(zip(batch.blocks, dims)):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            act = jax.nn.relu if i < self.num_layers - 1 else None
            h = GraphConv(dim, activation=act, dtype=self.dtype)(block, h, dst_caps[i])
        return h


class GraphSAGE(nn.Module):
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int
    dropout: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: SampledBatch, feats, dst_caps, *, deterministic=True):
        h = feats if self.dtype is None else feats.astype(self.dtype)
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.num_classes]
        for i, (block, dim) in enumerate(zip(batch.blocks, dims)):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            act = jax.nn.relu if i < self.num_layers - 1 else None
            h = SAGEConv(dim, activation=act, dtype=self.dtype)(block, h, dst_caps[i])
        return h


class PinSAGE(nn.Module):
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int
    dropout: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: SampledBatch, feats, dst_caps, *, deterministic=True):
        h = feats if self.dtype is None else feats.astype(self.dtype)
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.num_classes]
        for i, (block, dim) in enumerate(zip(batch.blocks, dims)):
            h = WeightedSAGEConv(self.hidden_dim, dim, self.dropout, dtype=self.dtype)(
                block, h, dst_caps[i], deterministic=deterministic
            )
        return h


class GAT(nn.Module):
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int
    num_heads: int = 8
    num_out_heads: int = 1
    dropout: float = 0.6
    attn_drop: float = 0.6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: SampledBatch, feats, dst_caps, *, deterministic=True):
        h = feats if self.dtype is None else feats.astype(self.dtype)
        heads = [self.num_heads] * (self.num_layers - 1) + [self.num_out_heads]
        for i, block in enumerate(batch.blocks):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            last = i == self.num_layers - 1
            out_dim = self.num_classes if last else self.hidden_dim
            act = None if last else jax.nn.elu
            o = GATConv(
                out_dim,
                heads[i],
                attn_drop=self.attn_drop,
                activation=act,
                dtype=self.dtype,
            )(block, h, dst_caps[i], deterministic=deterministic)
            h = o.mean(axis=1) if last else o.reshape(o.shape[0], -1)
        return h


def build_model(name: str, in_dim: int, hidden: int, num_classes: int,
                num_layers: int, dropout: float = 0.5,
                dtype=None) -> nn.Module:
    """dtype: compute dtype (e.g. jnp.bfloat16) — params stay float32
    (flax default param_dtype), activations/matmuls run in `dtype`."""
    name = name.lower()
    if name == "gcn":
        return GCN(in_dim, hidden, num_classes, num_layers, dropout,
                   dtype=dtype)
    if name in ("graphsage", "sage"):
        return GraphSAGE(in_dim, hidden, num_classes, num_layers, dropout,
                         dtype=dtype)
    if name == "pinsage":
        return PinSAGE(in_dim, hidden, num_classes, num_layers, dropout,
                       dtype=dtype)
    if name == "gat":
        return GAT(in_dim, hidden, num_classes, num_layers, dropout=dropout,
                   dtype=dtype)
    raise ValueError(f"unknown model {name}")
