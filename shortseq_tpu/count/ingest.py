"""Host-side ingest: indexed FASTQ rows -> padded packed-word buckets.

2-bit packing and bloom validation happen during the host gather
(io.fastq.gather_pack - reference semantics util.pyx:78-140 /
util.pxd:88-127), so the device receives packed uint32 lanes: 4x less
host->device traffic than shipping ASCII rows, and no separate device
validation pass.  The device pack kernel (ops.bitpack.pack_and_validate_u32)
remains the path for data already resident on device (batch.PackedBatch,
count_matrix_device).

Buckets follow the reference's width ladder (short_seq.pyx:54-74):
<=32 nt -> 2 lanes, <=96 -> 6, <=1024 -> 64.  The batch dimension is padded
to a power of two (compile-cache reuse; XLA recompiles per shape) with
PAD_LENGTH sentinel rows that unique_count drops.
"""

from __future__ import annotations

import numpy as np

from ..constants import MAX_64_NT, MAX_192_NT, MAX_VAR_NT, TOO_LONG_MSG

WIDTH_EDGES = [(0, MAX_64_NT, 32), (MAX_64_NT, MAX_192_NT, 96),
               (MAX_192_NT, MAX_VAR_NT, 1024)]


def quarter_pow2(n: int, floor: int = 256) -> int:
    """Round up to the next quarter-power-of-two step (2^k, 1.25*2^k,
    1.5*2^k, 1.75*2^k).  Plain pow2 padding wastes up to 100% of the
    batch in pad rows at unlucky sizes (10M reads -> 16.7M rows: +67%
    h2d transfer AND +67% rows through the sort); quarter steps bound
    the waste at 25% while keeping the compile-shape set closed (4 shapes
    per octave, so the persistent compile cache still converges)."""
    n = max(n, 1)
    if n <= floor:
        return floor
    base = 1 << (n - 1).bit_length() - 1  # largest pow2 < padded result
    for num in (5, 6, 7):
        cand = base * num // 4
        if cand >= n:
            return cand
    return base * 2


def pack_validate_padded(rows: np.ndarray, val_lengths: np.ndarray,
                         min_pad: int = 256, pad_valid: bool = False):
    """Device pack + validate of a host byte matrix with the repo's
    batch-padding rule in ONE place: the row count pads to a quarter-pow2
    step (>= min_pad; see quarter_pow2 - closed compile-shape set, pad
    waste bounded at 25% instead of pow2's +100%, and pad rows are h2d
    transfer) with PAD_BYTE rows whose validation length is 0 (vacuously
    valid - PAD_BYTE also passes the bloom and encodes to code 0, so the
    pad rows satisfy the pad_valid kernel contract).  Quarter steps
    >= 256 stay divisible by the row-fold factors the pack kernels pick
    (fold_for caps at 64 and shrinks to divide).

    pad_valid: pass True only when `rows` came from an in-repo builder
    (read_fastq_matrix, _ascii_matrix) whose tail bytes are PAD_BYTE -
    the device kernel then skips per-byte length masking (~1.5x faster
    fused pack+validate; ops.bitpack.pack_and_validate_folded).

    Returns (words [N_pad, width//16] device, ok [N] host bool): words
    keep the padded batch dim (device consumers want the padded shape);
    ok is sliced back to the caller's N rows.  Rows with ok=False have
    unspecified words (callers raise or filter; the reference raises
    before words are observable).
    """
    from ..constants import PAD_BYTE
    from ..ops.bitpack import pack_and_validate_rows

    n, width = rows.shape
    assert width % 16 == 0
    val_lengths = np.ascontiguousarray(val_lengths, np.int32)
    n_pad = quarter_pow2(n, floor=min_pad)
    if n_pad != n:
        rows = np.pad(rows, ((0, n_pad - n), (0, 0)),
                      constant_values=PAD_BYTE)
        val_lengths = np.pad(val_lengths, (0, n_pad - n))
    words, ok = pack_and_validate_rows(
        np.ascontiguousarray(rows).view(np.uint32), val_lengths,
        pad_valid=pad_valid)
    return words, np.asarray(ok)[:n]


def packed_buckets(data, starts, lengths, batch_size: int | None = None,
                   min_pad: int = 256, pad_pow2: bool | str = True):
    """Yield (words uint32 [M, width//16], sub_len int32 [M]) per width
    bucket, host-packed and host-validated, batch dim padded to a power of
    two (>= min_pad) with PAD_LENGTH rows.  batch_size caps the un-padded
    rows per yield (streaming pipelines); None = one batch per bucket.
    pad_pow2=False skips the batch-dim padding (host engines have no
    compile cache to feed); pad_pow2="quarter" pads to quarter-pow2 steps
    instead (see quarter_pow2 - bounded 25% waste for large device
    batches where pad rows cost real transfer and sort time).

    Raises the reference's errors: "Unsupported base character: X" on an
    invalid byte (short_seq_64.pyx:105), TOO_LONG_MSG past 1024 nt
    (short_seq.pyx:73-74).
    """
    from ..count.device import PAD_LENGTH
    from ..io.fastq import gather_pack

    lengths = np.asarray(lengths)
    if len(lengths) and int(lengths.max()) > MAX_VAR_NT:
        raise Exception(TOO_LONG_MSG)
    starts = np.asarray(starts)
    for lo, hi, width in WIDTH_EDGES:
        sel = (lengths > lo) & (lengths <= hi)
        if lo == 0:
            sel |= lengths == 0
        n_sel = int(np.count_nonzero(sel))
        if n_sel == 0:
            continue
        if n_sel == len(lengths):  # single-bucket file: skip the gather
            s_all, len_all = starts, lengths.astype(np.int32, copy=False)
        else:
            s_all = starts[sel]
            len_all = lengths[sel].astype(np.int32)
        bs = batch_size or len(len_all)
        for off in range(0, len(len_all), bs):
            sub_len = len_all[off:off + bs]
            words = gather_pack(data, s_all[off:off + bs], sub_len, width)
            m = len(sub_len)
            if pad_pow2 == "quarter":
                m_pad = quarter_pow2(m, floor=min_pad)
            elif isinstance(pad_pow2, str):
                # A typo ('Quarter', 'quarter ') silently reverting to
                # pow2 would reintroduce up-to-+100% pad waste unnoticed.
                raise ValueError(f"unknown pad_pow2 mode {pad_pow2!r}")
            elif pad_pow2:
                m_pad = max(min_pad, 1 << (m - 1).bit_length())
            else:
                m_pad = m
            if m_pad != m:
                words = np.pad(words, ((0, m_pad - m), (0, 0)))
                sub_len = np.pad(sub_len, (0, m_pad - m),
                                 constant_values=PAD_LENGTH)
            yield words, sub_len
