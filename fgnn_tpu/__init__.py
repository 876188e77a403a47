"""fgnn_tpu — TPU-native factored sample-based GNN training framework.

A from-scratch JAX/XLA/Pallas re-design of GNNLab/FGNN
(SJTU-IPADS/fgnn-artifacts, EuroSys'22): factored sampler/trainer chip
roles over a device mesh, pre-sampling-based HBM feature cache, and
segment-sum message passing. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .config import CachePolicy, RunArch, RunConfig, SampleType
from .data import Dataset, load_dataset, make_synthetic_dataset, write_dataset

__all__ = [
    "CachePolicy",
    "Dataset",
    "RunArch",
    "RunConfig",
    "SampleType",
    "load_dataset",
    "make_synthetic_dataset",
    "write_dataset",
]
