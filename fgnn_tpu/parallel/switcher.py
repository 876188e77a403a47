"""Balance-switcher engine (arch5 + switcher role).

Reference: example/samgraph/balance_switcher/train_pinsage.py — FGNN's
sampler GPUs finish their per-epoch sampling work early, so once sampling
is done each idle sampler re-registers as a trainer ("switcher") via
``sam.switch_init(worker, ctx, cache_pct)`` (train_pinsage.py:280-309) and
the epoch tail is trained by T+S GPUs, coordinated with forward_barrier
counters (engine.h:69-76).

TPU-native design: no process choreography — the epoch driver already
knows when sampling is finished (the wave queue drains), so the tail hook
simply moves the train state onto a second jitted train wave compiled over
the FULL sampler+trainer mesh ('data' axis of size S+T). Gradient
all-reduce rides ICI across all chips; the state hops meshes with a single
device_put each way.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RunConfig
from ..data.schema import Dataset
from ..utils import get_logger
from .factored import FactoredEngine

log = get_logger(__name__)


class SwitcherEngine(FactoredEngine):
    """arch5 with ``have_switcher``: sampler chips join training once their
    sampling work for the epoch is done."""

    # trainers keep pace with sampling (one group per drained wave); the
    # backlog — the reference's queue build-up that motivates switching —
    # is trained by the enlarged tail group
    max_groups_per_drain = 1

    def __init__(
        self,
        cfg: RunConfig,
        ds: Dataset,
        devices: Optional[Sequence] = None,
        feat_on_trainer: Optional[bool] = None,
    ):
        super().__init__(cfg, ds, devices, feat_on_trainer)
        s_devs = list(self.roles.sampler_mesh.devices.flat)
        t_devs = list(self.roles.trainer_mesh.devices.flat)
        # trainers first so trainer state layouts transfer cheaply
        self.full_mesh = Mesh(np.array(t_devs + s_devs), ("data",))
        self.full_repl = NamedSharding(self.full_mesh, P())
        self.full_shard = NamedSharding(self.full_mesh, P("data"))
        self.num_full = len(t_devs) + len(s_devs)

        self.label_full = jax.device_put(np.asarray(ds.label), self.full_repl)
        # the switcher's own feature residency: the reference gives the
        # switcher GPU a separately-sized cache built from the SAME
        # ranking (sam.switch_init(..., cache_percentage),
        # train_pinsage.py:309; DoSwitchCacheFeatureCopy). Tail groups
        # recompute their miss split against this cache — the shipped
        # sampler-side index was classified against the trainer cache.
        self.switch_cache = None
        if self.cache is not None and cfg.switch_cache_percentage > 0:
            from ..cache.manager import FeatureCache

            self.switch_cache = FeatureCache(
                self.cache.feat_host,
                self.cache.ranking,
                cfg.switch_cache_percentage,
                ds.num_node,
                dtype=self.cache.dtype,
            )
        self.train_wave_full = self._make_train_wave(
            self.full_repl, self.full_shard, self.label_full
        )
        log.info(
            "SwitcherEngine: epoch tail trains on %d chips (%d trainers + "
            "%d switchers)", self.num_full, len(t_devs), len(s_devs),
        )

    _in_tail = False

    def _feats_for(self, batch_t, index=None):
        if self._in_tail and self.switch_cache is not None:
            # tail groups include switcher chips whose cache is sized by
            # switch_cache_percentage — reclassify against it (the shipped
            # index was computed for the trainer cache)
            import jax.numpy as jnp

            ids = np.asarray(batch_t.input_nodes)
            idx = self.switch_cache.get_miss_cache_index(jnp.asarray(ids))
            miss = self.switch_cache.host_extract_miss(
                np.asarray(idx.miss_ids), int(idx.num_miss)
            )
            return self.switch_cache.combine(idx, jax.device_put(miss))
        return super()._feats_for(batch_t, index)

    def _train_tail(self, pending_batches, base, losses, accs):
        if not pending_batches:
            return
        W = self.num_full
        n_tail = len(pending_batches)
        state_full = jax.device_put(self.state, self.full_repl)
        self._in_tail = True
        try:
            while pending_batches:
                group = []
                while pending_batches and len(group) < W:
                    group.append(pending_batches.popleft())
                key = jax.random.fold_in(base, 0xD0 + len(losses))
                state_full, loss, acc = self._run_group(
                    state_full, group, self.train_wave_full, self.full_shard,
                    W, key,
                )
                losses.append(loss)
                accs.append(acc)
        finally:
            self._in_tail = False
        self.state = jax.device_put(state_full, self.roles.trainer_replicated)
        log.debug("switcher tail: trained %d batches on %d chips", n_tail, W)
