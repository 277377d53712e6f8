"""Public object API.  Prefers the native C++ extension when built; falls
back to the pure-Python implementation with identical semantics."""

import os

_FORCE_PYTHON = os.environ.get("SHORTSEQ_TPU_FORCE_PYTHON", "") == "1"

BACKEND = "python"
if not _FORCE_PYTHON:
    try:
        from .._native import (  # type: ignore
            ShortSeq64, ShortSeq192, ShortSeqVar,
            pack, from_str, from_bytes, empty,
        )
        BACKEND = "native"
    except ImportError:
        pass

if BACKEND == "python":
    from .seq import (
        ShortSeq64, ShortSeq192, ShortSeqVar,
        pack, from_str, from_bytes, empty, from_blocks,
    )
else:
    try:
        from .._native import from_blocks  # type: ignore
    except ImportError:
        from .seq import from_blocks

from .seq import get_domain_64, get_domain_192, get_domain_var
from .counter import ShortSeqCounter, read_and_count_fastq
