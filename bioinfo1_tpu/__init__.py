"""bioinfo1_tpu — a TPU-native long-read-to-reference mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
course mapper (AnamarijaKic/bioinfo1): minimizer indexing of a reference
genome, seed matching, LIS chaining, and Needleman-Wunsch / Smith-Waterman /
semi-global DP alignment with CIGAR output in PAF format.

Layers:
  io/        host-side FASTA/FASTQ ingestion, packing, PAF serialization
  ops/       device kernels: minimizers, LIS chaining, wavefront alignment
  index/     sorted-array minimizer index (build + lookup)
  pipeline/  end-to-end batched mapping under jit
  parallel/  multi-chip sharding (jax.sharding.Mesh + shard_map)
  utils/     encoding tables, CIGAR helpers, config
  reference_model  executable specification used as the test oracle
"""

__version__ = "0.1.0"
PROGRAM_NAME = "bioinfo1-tpu"

from bioinfo1_tpu.reference_model import (  # noqa: F401
    ALIGNMENT_TYPES,
    MapperParams,
)

_LAZY = {
    "Mapper": ("bioinfo1_tpu.pipeline.mapper", "Mapper"),
    "MapperConfig": ("bioinfo1_tpu.pipeline.mapper", "MapperConfig"),
    "map_all": ("bioinfo1_tpu.pipeline.mapper", "map_all"),
    "build_index": ("bioinfo1_tpu.index.builder", "build_index"),
    "map_step": ("bioinfo1_tpu.pipeline.device_map", "map_step"),
}


def __getattr__(name):
    """Lazy top-level API (importing jax only when the API is used)."""
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
