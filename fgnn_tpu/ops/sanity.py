"""Runtime sanity checks (opt-in).

Analog of cuda_sanity_check.cu / cpu_sanity_check.cc, enabled by
``FGNN_TPU_SANITY_CHECK`` (reference SAMGRAPH_SANITY_CHECK,
run_config.cc:91-93):
  * no kEmptyKey leaks into the *valid* region of a batch,
  * no train node sampled twice within an epoch (per-epoch bitmap),
  * block local ids stay within their static caps.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.sampling import SampledBatch


class EpochSanityChecker:
    def __init__(self, num_node: int):
        self.num_node = num_node
        self.seen = np.zeros(num_node, dtype=bool)

    def reset(self) -> None:
        self.seen[:] = False

    def check_batch(self, batch: SampledBatch, plan) -> None:
        out = np.asarray(batch.output_nodes)
        n_out = int(batch.num_output)
        valid_out = out[:n_out]
        # 1. no empty keys among the declared-real outputs
        assert (valid_out >= 0).all(), "padding leaked into valid outputs"
        assert (valid_out < self.num_node).all(), "node id out of range"
        # 2. train-node uniqueness within the epoch (GPUBatchSanityCheck)
        dup = self.seen[valid_out]
        assert not dup.any(), (
            f"train nodes sampled twice this epoch: {valid_out[dup][:10]}"
        )
        self.seen[valid_out] = True
        # 3. per-block invariants
        for bi, blk in enumerate(batch.blocks):
            hop = len(batch.blocks) - 1 - bi
            mask = np.asarray(blk.mask)
            src = np.asarray(blk.src_local)[mask]
            dst = np.asarray(blk.dst_local)[mask]
            assert (src >= 0).all() and (dst >= 0).all()
            # deepest block: with dedup_last_hop=False the src space is
            # [frontier | edge slots] = len(input_nodes), not the dedup cap
            src_cap = (
                batch.input_nodes.shape[0]
                if bi == 0
                else plan.num_unique_cap[hop]
            )
            assert src.max(initial=0) < src_cap
            assert dst.max(initial=0) < plan.num_input_cap[hop]
        # 4. input nodes valid where declared
        inp = np.asarray(batch.input_nodes)
        assert (inp < self.num_node).all()
