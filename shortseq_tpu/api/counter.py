"""ShortSeqCounter - Counter-style exact deduplication.

Parity type for the reference counter (reference counter.pyx:10-54): a dict
subclass whose keys are restricted to ShortSeq types and whose counting
ingest accepts a list of PyBytes.  The reference's private
_PyDict_*_KnownHash entry points exist to skip re-hashing; here __hash__ is
a trivial field read (the packed word), so the public dict protocol is the
same speed class - and the *throughput* path is not this object at all but
the device sort-unique-count in shortseq_tpu.count, which this class
materializes from.
"""

from __future__ import annotations

import time


def _backend():
    """The resolved object backend (native extension or pure Python).
    Lazy to avoid a circular import with the package __init__."""
    from .. import api

    return api


class ShortSeqCounter(dict):
    def __init__(self, source=None):
        super().__init__()
        if type(source) is list:
            self._count_py_bytes_list(source)

    def __setitem__(self, key, val):
        # Key-type restriction (reference counter.pyx:17-19)
        b = _backend()
        if type(key) not in (b.ShortSeq64, b.ShortSeq192, b.ShortSeqVar):
            raise TypeError(f"{self.__class__} does not support {type(key)} keys")
        dict.__setitem__(self, key, val)

    def _count_py_bytes_list(self, it):
        from_bytes = _backend().from_bytes
        get = self.get
        setter = dict.__setitem__
        for seqbytes in it:
            s = from_bytes(seqbytes)
            setter(self, s, get(s, 0) + 1)

    def count_sequences(self, seqs):
        """Ingest an iterable of already-packed ShortSeq objects."""
        get = self.get
        setter = dict.__setitem__
        for s in seqs:
            setter(self, s, get(s, 0) + 1)

    def update_counts(self, pairs):
        """Merge (ShortSeq, count) pairs - used by the device-count and
        distributed-merge paths to materialize their tables."""
        get = self.get
        setter = dict.__setitem__
        for s, c in pairs:
            setter(self, s, get(s, 0) + c)


def read_and_count_fastq(filename) -> ShortSeqCounter:
    """End-to-end FASTQ dedup pipeline with the reference's phase-timing
    print (reference counter.pyx:57-71).

    Uses the batched device pipeline (reader -> pack kernel -> device
    sort-unique-count) and materializes a reference-identical counter.
    """
    from ..io.fastq import read_fastq_seqs

    t1 = time.time()
    seqs = read_fastq_seqs(filename)
    t2 = time.time()
    counts = ShortSeqCounter()
    counts.count_sequences(seqs)
    t3 = time.time()

    print(f"{t2 - t1:.2f}s to read {len(seqs)} total seqs, "
          f"and {t3 - t2:.2f}s to count {len(counts)} unique sequences")
    return counts
