"""Binary dataset loader (mmap).

Loads the reference's on-disk format — ``meta.txt`` plus flat ``.bin``
files — exactly as Engine::LoadGraphDataset does
(/root/reference/samgraph/common/engine.cc:73-264): ids are uint32 on disk
(viewed as int32 here), features float32, labels uint64 (converted to int32).
Everything is mmap-backed (np.memmap, read-only) so papers100M-scale data
never fully materialises in host RAM; the "empty feat" escape hatch
(SAMGRAPH_EMPTY_FEAT analog, engine.cc:138-155) substitutes a small fake
feature table for runs where the real 56GB feat file is absent.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .. import constants
from ..utils import get_logger
from .schema import Dataset

log = get_logger(__name__)


def parse_meta(path: str) -> Dict[str, int]:
    """Parse meta.txt: whitespace-separated ``KEY value`` lines
    (engine.cc:86-99)."""
    meta: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            kv = line.split()
            if len(kv) < 2:
                break
            meta[kv[0]] = int(kv[1])
    return meta


def _mmap(path: str, dtype, shape) -> np.ndarray:
    return np.memmap(path, dtype=dtype, mode="r", shape=shape)


def _opt_mmap(path: str, dtype, shape) -> Optional[np.ndarray]:
    return _mmap(path, dtype, shape) if os.path.exists(path) else None


def load_dataset(
    name: str,
    root: Optional[str] = None,
    empty_feat: int = 0,
) -> Dataset:
    """Load ``<root>/<name>`` in the reference binary layout."""
    root = root or os.environ.get(
        constants.ENV_DATASET_ROOT, constants.DEFAULT_DATASET_ROOT
    )
    d = os.path.join(root, name)
    meta = parse_meta(os.path.join(d, constants.META_FILE))

    num_node = meta[constants.META_NUM_NODE]
    num_edge = meta[constants.META_NUM_EDGE]
    feat_dim = meta[constants.META_FEAT_DIM]

    indptr = _mmap(os.path.join(d, constants.INDPTR_FILE), np.uint32, (num_node + 1,))
    indices = _mmap(
        os.path.join(d, constants.INDICES_FILE), np.uint32, (num_edge,)
    ).view(np.int32)

    feat_path = os.path.join(d, constants.FEAT_FILE)
    is_empty_feat = not (os.path.exists(feat_path) and empty_feat == 0)
    if not is_empty_feat:
        feat = _mmap(feat_path, np.float32, (num_node, feat_dim))
    else:
        # empty-feat mode: small fake table indexed modulo (engine.cc:138-155)
        fake_nodes = 1 << (empty_feat or 20)
        log.warning("feat.bin missing or empty_feat set: fake feat table of %d rows", fake_nodes)
        feat = np.zeros((min(fake_nodes, num_node), feat_dim), dtype=np.float32)

    label_path = os.path.join(d, constants.LABEL_FILE)
    if os.path.exists(label_path):
        label = np.asarray(
            _mmap(label_path, np.uint64, (num_node,))
        ).astype(np.int32)
    else:
        label = np.zeros((num_node,), dtype=np.int32)

    def _set(fname, key):
        return np.asarray(
            _mmap(os.path.join(d, fname), np.uint32, (meta[key],))
        ).astype(np.int32)

    ds = Dataset(
        name=name,
        num_node=num_node,
        num_edge=num_edge,
        num_class=meta[constants.META_NUM_CLASS],
        indptr=np.asarray(indptr).astype(np.int64),
        indices=indices,
        feat=feat,
        label=label,
        train_set=_set(constants.TRAIN_SET_FILE, constants.META_NUM_TRAIN_SET),
        test_set=_set(constants.TEST_SET_FILE, constants.META_NUM_TEST_SET),
        valid_set=_set(constants.VALID_SET_FILE, constants.META_NUM_VALID_SET),
        prob_table=_opt_mmap(
            os.path.join(d, constants.PROB_TABLE_FILE), np.float32, (num_edge,)
        ),
        alias_table=(
            a.view(np.int32)
            if (a := _opt_mmap(os.path.join(d, constants.ALIAS_TABLE_FILE), np.uint32, (num_edge,)))
            is not None
            else None
        ),
        prob_prefix_table=_opt_mmap(
            os.path.join(d, constants.PROB_PREFIX_TABLE_FILE), np.float32, (num_edge,)
        ),
        in_degrees=(
            a.view(np.int32)
            if (a := _opt_mmap(os.path.join(d, constants.IN_DEGREE_FILE), np.uint32, (num_node,)))
            is not None
            else None
        ),
        out_degrees=(
            a.view(np.int32)
            if (a := _opt_mmap(os.path.join(d, constants.OUT_DEGREE_FILE), np.uint32, (num_node,)))
            is not None
            else None
        ),
        empty_feat=is_empty_feat and feat.shape[0] < num_node,
    )
    ds.validate()
    return ds


def load_cache_ranking(name: str, policy_file: str, root: Optional[str] = None) -> np.ndarray:
    """Load a precomputed cache ranking file (cache_by_*.bin)."""
    root = root or os.environ.get(
        constants.ENV_DATASET_ROOT, constants.DEFAULT_DATASET_ROOT
    )
    d = os.path.join(root, name)
    meta = parse_meta(os.path.join(d, constants.META_FILE))
    return np.asarray(
        _mmap(os.path.join(d, policy_file), np.uint32, (meta[constants.META_NUM_NODE],))
    ).astype(np.int32)
