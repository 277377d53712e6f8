"""shortseq_tpu - a TPU-native short-sequence encoding engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ShortSeq library (see SURVEY.md): 2-bit packing of A/C/T/G reads
into 64/192/variable-width words, lazy decoding, validated input, XOR +
popcount hamming distance, Counter-style exact deduplication, a FASTQ
pipeline, and UMI deduplication - plus what the reference does not have:
batched device ops, Pallas kernels, and multi-host data-parallel dedup with
collective merges over a jax.sharding.Mesh.

Public surface matches the reference package (reference
shortseq/__init__.py:1-14) and adds the batch/device APIs.
"""

from .api import (
    pack,
    from_str,
    from_bytes,
    empty,
    ShortSeq64,
    ShortSeq192,
    ShortSeqVar,
    ShortSeqCounter,
    read_and_count_fastq,
    get_domain_64,
    get_domain_192,
    get_domain_var,
    BACKEND,
)

MIN_VAR_NT, MAX_VAR_NT = get_domain_var()
MIN_192_NT, MAX_192_NT = get_domain_192()
MIN_64_NT, MAX_64_NT = get_domain_64()

__version__ = "0.1.0"

__all__ = [
    "pack", "from_str", "from_bytes", "empty",
    "ShortSeq64", "ShortSeq192", "ShortSeqVar",
    "ShortSeqCounter", "read_and_count_fastq",
    "MIN_64_NT", "MAX_64_NT", "MIN_192_NT", "MAX_192_NT",
    "MIN_VAR_NT", "MAX_VAR_NT", "BACKEND",
]
