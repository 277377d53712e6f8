"""FASTQ ingest: sequence line (2nd of every 4) extraction.

The reference reads with a C getline loop (reference fast_read.pyx:3-40,
line selection `count % 2 == 0 and count % 4 != 0` = 0-based line index
% 4 == 1, trailing newline stripped).  Here the host-side parse is
vectorized numpy over the whole buffer (C speed, no Python loop per line);
a C++ mmap sharder with byte-range splitting for multi-host runs lives in
csrc/ and is used when built.

Three consumers:
  * read_fastq_index + gather_pack -> packed uint32 lanes straight from
    the file buffer (the throughput path: fused native gather + 2-bit pack
    + bloom validate, count/ingest.packed_buckets).
  * read_fastq_matrix -> padded uint8 matrix + lengths, feeding the device
    pack kernel (for data that should arrive on device as ASCII).
  * read_fastq_seqs   -> list of ShortSeq objects (reference-compatible).

Gzip input is detected by magic bytes and decompressed transparently.
Plain gzip allows whole-file reads only; BGZF (bgzip) files additionally
support byte-range sharding on block boundaries (io/bgzf.py), so
multi-shard/multi-host and streaming ingest work on compressed input.
"""

from __future__ import annotations

import numpy as np

from ..constants import PAD_BYTE


def _is_gzip(filename) -> bool:
    with open(filename, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


def _read_bytes(filename) -> bytes:
    """Whole-file read, transparently decompressing gzip (detected by
    magic bytes, not extension - real FASTQ is usually .fastq.gz; the
    reference's getline reader cannot read it at all)."""
    if _is_gzip(filename):
        import gzip

        with gzip.open(filename, "rb") as f:
            _advise_sequential(f)  # the compressed stream scan is
            return f.read()        # sequential too (fileno passthrough)
    with open(filename, "rb") as f:
        _advise_sequential(f)
        return f.read()


def _advise_sequential(f) -> None:
    """Kernel readahead hint for the sequential whole-file scan (the
    reference documents the same posix_fadvise intent for its getline
    reader, fast_read.pxd:11-17).  Best-effort: not every platform or
    file object supports it."""
    try:
        import os

        os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_SEQUENTIAL)
    except (AttributeError, OSError):
        pass


# Longest FASTQ record we expect to straddle a shard boundary: header +
# 1024 nt seq + separator + 1024 qual, with slack for long headers.
_SYNC_MARGIN = 1 << 20


_GZIP_SHARD_MSG = (
    "byte-range sharding needs random access; plain gzip streams have "
    "none. Recompress with bgzip (BGZF blocks ARE shardable here) or "
    "decompress once before multi-shard/multi-host runs.")


def _bgzf_range_or_raise(filename, lo: int, hi: int) -> bytes:
    """Shared gzip-input routing for the ranged readers: BGZF files
    return the shard's pre-synced whole records (io.bgzf), plain gzip
    raises the one canonical message."""
    from .bgzf import is_bgzf, read_range_synced

    if not is_bgzf(filename):
        raise ValueError(_GZIP_SHARD_MSG)
    return read_range_synced(filename, lo, hi)


def _read_range_synced(filename, lo: int, hi: int):
    """Read only the bytes needed for the records starting in [lo, hi):
    [lo-1, hi + margin), so each host's IO is proportional to its shard,
    not the file (the multi-host analog of the reference's posix_fadvise
    sequential hint, fast_read.pxd:11-17).  Returns (buffer, base) where
    sync offsets relative to the buffer are absolute - base.

    The extra leading byte lets the record-sync scan see the newline just
    before `lo`, so every shard computes the exact same boundary as a
    full-file scan would; the trailing margin bounds how far past `hi` the
    first record start may be (any real <=1024 nt FASTQ record is ~2.5 KB,
    far under the 1 MB margin)."""
    import os

    if _is_gzip(filename):
        # (BGZF files never reach here: callers route them through
        # _bgzf_range_or_raise, which shards on block boundaries.)
        raise ValueError(_GZIP_SHARD_MSG)
    if hi < lo:
        # An inverted range would make f.read(read_hi - base) negative,
        # i.e. read-to-EOF: the whole file tail instead of an error.
        raise ValueError(f"inverted byte_range: lo {lo} > hi {hi}")
    size = os.path.getsize(filename)
    lo = max(0, min(lo, size))
    base = max(0, lo - 1)
    read_hi = min(size, max(hi, lo) + _SYNC_MARGIN)
    with open(filename, "rb") as f:
        _advise_sequential(f)
        f.seek(base)
        return f.read(read_hi - base), base


def fastq_sync(data: bytes, offset: int) -> int:
    """First FASTQ record boundary at or after `offset`: a line start whose
    line begins '@' and where the line two lines later begins '+'.

    Pure-Python twin of the native ssq_fastq_sync (csrc/fastq_index.cpp) -
    byte-for-byte the same boundary decisions, so shards computed with and
    without the native library agree.  Quality lines may legally start with
    '@' (quality 31 -> chr 64); the look-two-ahead check rejects those,
    because two lines after a quality line is a sequence line, never '+'.
    """
    n = len(data)
    if offset <= 0:
        return 0
    p = data.find(b"\n", max(offset - 1, 0))
    while p != -1:
        ls = p + 1
        if ls >= n:
            return n
        if data[ls] == 0x40:  # '@'
            nl1 = data.find(b"\n", ls)
            if nl1 == -1:
                return n
            nl2 = data.find(b"\n", nl1 + 1)
            if nl2 == -1:
                return n
            if nl2 + 1 < n and data[nl2 + 1] == 0x2B:  # '+'
                return ls
        p = data.find(b"\n", ls)
    return n


def fastq_line_index(buf: np.ndarray):
    """Return (starts, ends) byte offsets of every sequence line in a FASTQ
    buffer (newline excluded)."""
    nl = np.flatnonzero(buf == 10)
    if buf.size and (nl.size == 0 or nl[-1] != buf.size - 1):
        # tolerate a missing final newline
        nl = np.append(nl, buf.size)
    starts = np.empty_like(nl)
    starts[0] = 0
    starts[1:] = nl[:-1] + 1
    seq_starts = starts[1::4]
    seq_ends = nl[1::4]
    return seq_starts, seq_ends


def read_fastq_matrix(filename, pad_to: int = 16, byte_range=None):
    """Parse a FASTQ file into a PAD_BYTE-padded `[N, L]` uint8 matrix
    plus `[N]` int32 lengths, L rounded up to a multiple of `pad_to`
    (static shapes for XLA).  The pad byte (constants.PAD_BYTE, 0x01)
    passes the reference bloom and encodes to code 0, so the device fused
    pack+validate can skip length masking (ops.bitpack pad_valid=True).

    Uses the native C++ sharder (csrc/fastq_index.cpp) when available -
    multi-threaded memchr indexing at memory bandwidth - and falls back to
    the vectorized numpy parse.  `byte_range=(lo, hi)` restricts parsing to
    the records starting inside the range (multi-host sharding; native only).
    """
    from .native import fastq_matrix_native

    if byte_range is not None:
        # Ranged read: only this shard's bytes (+ sync margin) touch disk.
        lo, hi = byte_range
        if _is_gzip(filename):
            data = _bgzf_range_or_raise(filename, lo, hi)  # synced records
            native = fastq_matrix_native(data, pad_to=pad_to)
            if native is not None:
                return native
        else:
            data, base = _read_range_synced(filename, lo, hi)
            native = fastq_matrix_native(
                data, pad_to=pad_to, byte_range=(lo - base, hi - base))
            if native is not None:
                return native
            # Pure-Python fallback: same sync decisions as the native
            # sharder (fastq_sync is its byte-for-byte twin), then the
            # vectorized numpy parse on the synced slice.
            s_lo = fastq_sync(data, lo - base)
            s_hi = fastq_sync(data, hi - base)
            data = data[s_lo:s_hi]
    else:
        data = _read_bytes(filename)
        native = fastq_matrix_native(data, pad_to=pad_to)
        if native is not None:
            return native
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros((0, pad_to), dtype=np.uint8), np.zeros(0, dtype=np.int32)
    starts, ends = fastq_line_index(buf)
    lengths = (ends - starts).astype(np.int32)
    n = len(lengths)
    if n == 0:
        return np.zeros((0, pad_to), dtype=np.uint8), lengths
    max_len = int(lengths.max())
    width = max(pad_to, -(-max_len // pad_to) * pad_to)
    # Vectorized gather in row chunks: each chunk builds an [C, width]
    # offset matrix + mask (bounded transient memory, ~9x the chunk's
    # bytes), so the no-native path runs at numpy take speed instead of a
    # per-row Python loop.
    mat = np.empty((n, width), dtype=np.uint8)
    chunk = max(1, (8 << 20) // max(width, 1))   # ~8 MB of rows per chunk
    col = np.arange(width, dtype=np.int64)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        idx = starts[lo:hi, None] + col[None, :]
        keep = col[None, :] < lengths[lo:hi, None]
        np.take(buf, np.minimum(idx, buf.size - 1), out=mat[lo:hi])
        mat[lo:hi] *= keep
        mat[lo:hi] += np.uint8(PAD_BYTE) * ~keep   # pad_valid contract
    return mat, lengths


def read_fastq_index(filename, byte_range=None):
    """Index a FASTQ file without gathering: (buffer bytes, starts int64,
    lengths int32) of every sequence line, ready for gather_pack.  Uses the
    native indexer when built; numpy fallback otherwise.  byte_range
    restricts to records starting inside [lo, hi) (multi-host sharding),
    reading only that slice (+ sync margin) from disk."""
    from .native import fastq_index_native

    if byte_range is not None:
        lo, hi = byte_range
        if _is_gzip(filename):
            # Pre-synced whole records: no further boundary work.
            data, rng = _bgzf_range_or_raise(filename, lo, hi), None
        else:
            data, base = _read_range_synced(filename, lo, hi)
            rng = (lo - base, hi - base)
    else:
        data, rng = _read_bytes(filename), None
    native = fastq_index_native(data, rng)
    if native is not None:
        return native
    if rng is not None:
        s_lo = fastq_sync(data, rng[0])
        s_hi = fastq_sync(data, rng[1])
        data = data[s_lo:s_hi]
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return data, np.zeros(0, np.int64), np.zeros(0, np.int32)
    starts, ends = fastq_line_index(buf)
    return data, starts.astype(np.int64), (ends - starts).astype(np.int32)


def gather_pack(data: bytes, starts, lengths, width: int):
    """Gather + 2-bit pack indexed rows from the file buffer into
    [N, width//16] uint32 packed lanes (reference bit layout, util.pyx:
    100-140), validating every byte with the reference's exact bloom
    semantics.  Rows longer than `width` are truncated (callers bucket by
    width first).  Native single pass when built; vectorized numpy twin
    otherwise - bit-identical outputs (tests/test_native_io.py)."""
    from .native import gather_pack_native

    native = gather_pack_native(data, starts, lengths, width)
    if native is not None:
        return native
    from ..constants import UNSUPPORTED_BASE_MSG
    from ..oracle import first_invalid_char

    assert width % 16 == 0
    buf = np.frombuffer(data, dtype=np.uint8)
    starts = np.asarray(starts, dtype=np.int64)
    n = len(starts)
    words = np.empty((n, width // 16), dtype=np.uint32)
    col = np.arange(width, dtype=np.int64)
    shift = (2 * (np.arange(width, dtype=np.uint32) % 16))
    chunk = max(1, (8 << 20) // max(width, 1))   # ~8 MB of rows per chunk
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        lens = np.minimum(lengths[lo:hi], width)
        idx = starts[lo:hi, None] + col[None, :]
        keep = col[None, :] < lens[:, None]
        sub = buf[np.minimum(idx, buf.size - 1)] * keep
        v = sub & 63
        # Bloom pass set {1, 3, 7, 20} of (c & 63) - reference
        # util.pxd:88-127; zeroed out-of-range bytes are vacuously ok.
        ok = (v == 1) | (v == 3) | (v == 7) | (v == 20) | ~keep
        if not ok.all():
            r = int(np.argmin(ok.all(axis=1)))
            row = bytes(buf[starts[lo + r]:starts[lo + r] + int(lens[r])])
            raise Exception(
                f"{UNSUPPORTED_BASE_MSG}: {first_invalid_char(row)}")
        codes = ((sub.astype(np.uint32) >> 1) & 3) << shift
        words[lo:hi] = np.bitwise_or.reduce(
            codes.reshape(hi - lo, width // 16, 16), axis=2)
    return words


def read_fastq_lines(filename):
    """Sequence lines as a list of bytes (newline stripped)."""
    data = _read_bytes(filename)
    if not data:
        return []
    lines = data.split(b"\n")
    return lines[1::4]


def read_fastq_seqs(filename):
    """Sequence lines packed into ShortSeq objects, like the reference's
    _read_fastq_short_seqs (fast_read.pyx:3-20)."""
    from ..api import from_bytes

    return [from_bytes(line) for line in read_fastq_lines(filename)]
