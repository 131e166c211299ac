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
