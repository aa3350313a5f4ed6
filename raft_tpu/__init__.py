"""raft_tpu — TPU-native repeat-aware read fragmentation framework.

A from-scratch rebuild of the capabilities of at-cg/RAFT (reference at
``/root/reference``) designed TPU-first: columnar host I/O (C++), batched
``[B, W]`` device tensors, JAX/Pallas kernels for coverage pileup and
repeat scanning, and ``shard_map`` data parallelism over reads.
"""

from raft_tpu.params import AlgoParams
from raft_tpu.pipeline import run_pipeline, RunStats

__version__ = "0.1.0"
__all__ = ["AlgoParams", "run_pipeline", "RunStats"]
