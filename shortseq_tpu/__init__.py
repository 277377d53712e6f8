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

import os as _os

# Persistent XLA compilation cache: compiles dominate small-batch latency
# (each uncached TPU compile costs seconds to minutes through a remote
# compile service), and the count/pack programs come from a small closed
# set of shapes thanks to power-of-two batch padding.  Opt out with
# SHORTSEQ_TPU_NO_CACHE=1.
if _os.environ.get("SHORTSEQ_TPU_NO_CACHE") != "1":
    try:
        import jax as _jax

        # Respect an application that already configured the process-wide
        # cache (programmatically or via env) - an import must not
        # repoint another library's cache as a side effect.
        if not (_jax.config.jax_compilation_cache_dir
                or _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/shortseq_tpu/jax_cache"))
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            _jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a requirement
        pass

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
    read_and_count_fastq_table,
    get_domain_64,
    get_domain_192,
    get_domain_var,
    BACKEND,
)

from .batch import PackedBatch, pack_batch
from .count import CountTable

MIN_VAR_NT, MAX_VAR_NT = get_domain_var()
MIN_192_NT, MAX_192_NT = get_domain_192()
MIN_64_NT, MAX_64_NT = get_domain_64()

__version__ = "0.1.0"

__all__ = [
    "pack", "from_str", "from_bytes", "empty",
    "ShortSeq64", "ShortSeq192", "ShortSeqVar",
    "ShortSeqCounter", "read_and_count_fastq",
    "read_and_count_fastq_table", "CountTable",
    "MIN_64_NT", "MAX_64_NT", "MIN_192_NT", "MAX_192_NT",
    "MIN_VAR_NT", "MAX_VAR_NT", "BACKEND",
    "PackedBatch", "pack_batch",
]
