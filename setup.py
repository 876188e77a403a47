"""Build/install fgnn_tpu.

The native extension (fgnn_tpu/native) is optional: a C++/OpenMP host
runtime for the hot host-side paths (parallel feature gather from mmap,
frequency counting). Built via `python setup.py build_native` or the
Makefile in fgnn_tpu/native; pure-NumPy fallbacks keep everything working
without it.
"""
from setuptools import find_packages, setup

setup(
    name="fgnn_tpu",
    version="0.1.0",
    description=(
        "TPU-native factored sample-based GNN training framework "
        "(GNNLab/FGNN capabilities, JAX/XLA/Pallas)"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy"],
)
