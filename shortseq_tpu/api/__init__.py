"""Public object API.  Prefers the native C++ extension (built on demand
from csrc/shortseq_native.cpp - physically 32/48/64-288-byte objects with
C-speed dunders); falls back to the pure-Python implementation with
identical semantics.  Force the fallback with SHORTSEQ_TPU_FORCE_PYTHON=1."""

from ..native_build import load as _load_native

_native = _load_native()

if _native is not None:
    ShortSeq64 = _native.ShortSeq64
    ShortSeq192 = _native.ShortSeq192
    ShortSeqVar = _native.ShortSeqVar
    pack = _native.pack
    from_str = _native.from_str
    from_bytes = _native.from_bytes
    from_blocks = _native.from_blocks
    empty = _native.empty
    BACKEND = "native"
else:
    from .seq import (
        ShortSeq64, ShortSeq192, ShortSeqVar,
        pack, from_str, from_bytes, empty, from_blocks,
    )
    BACKEND = "python"

from .seq import get_domain_64, get_domain_192, get_domain_var
from .counter import (ShortSeqCounter, read_and_count_fastq,
                      read_and_count_fastq_table)
