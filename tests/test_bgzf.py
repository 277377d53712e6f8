"""BGZF (bgzip) byte-range sharding: block detection, exact record
partition across shards, and pipeline parity on compressed input
(VERDICT r04 next-step 9; beyond-parity - the reference's reader is
plain stdio, fast_read.pyx:3-20, and cannot read compressed files)."""

import collections
import random
import struct
import zlib

import pytest

from tests.conftest import rand_sequence


def bgzf_block(payload: bytes) -> bytes:
    """One BGZF block: gzip member with the BC extra subfield carrying
    the block's total compressed size (SAM spec section 4.1)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = 12 + 6 + len(comp) + 8  # header + extra + deflate + trailer
    header = (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
              + struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2)
              + struct.pack("<H", bsize - 1))
    trailer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                          len(payload) & 0xFFFFFFFF)
    return header + comp + trailer


def bgzf_compress(data: bytes, block: int = 1000) -> bytes:
    """Multi-block BGZF stream + the standard empty EOF block."""
    out = [bgzf_block(data[i:i + block]) for i in range(0, len(data), block)]
    out.append(bgzf_block(b""))
    return b"".join(out)


def _make_fastq_bytes(rng, n=300):
    reads = [rand_sequence(rng, rng.randint(5, 120)) for _ in range(n)]
    reads += reads[: n // 3]  # duplicates for the count tests
    data = "".join(f"@r{i}_{'x' * rng.randint(0, 9)}\n{r}\n+\n{'I' * len(r)}\n"
                   for i, r in enumerate(reads)).encode()
    return data, reads


class TestBgzfFormat:
    def test_roundtrip_is_valid_gzip(self, rng):
        import gzip

        data, _ = _make_fastq_bytes(rng)
        comp = bgzf_compress(data)
        assert gzip.decompress(comp) == data

    def test_detection(self, tmp_path, rng):
        import gzip

        from shortseq_tpu.io.bgzf import is_bgzf

        data, _ = _make_fastq_bytes(rng)
        bgz = tmp_path / "a.fastq.bgz"
        bgz.write_bytes(bgzf_compress(data))
        gz = tmp_path / "a.fastq.gz"
        gz.write_bytes(gzip.compress(data))
        plain = tmp_path / "a.fastq"
        plain.write_bytes(data)
        assert is_bgzf(str(bgz))
        assert not is_bgzf(str(gz))
        assert not is_bgzf(str(plain))

    def test_block_walk(self, tmp_path, rng):
        from shortseq_tpu.io.bgzf import block_size_at, first_block_at

        data, _ = _make_fastq_bytes(rng)
        comp = bgzf_compress(data, block=700)
        path = tmp_path / "w.bgz"
        path.write_bytes(comp)
        # Walk the chain from 0; boundaries must tile the file.
        offs = [0]
        while offs[-1] < len(comp):
            bs = block_size_at(comp, offs[-1])
            assert bs is not None, offs[-1]
            offs.append(offs[-1] + bs)
        assert offs[-1] == len(comp)
        # first_block_at from any interior position lands on the chain.
        with open(path, "rb") as f:
            for pos in range(0, len(comp), 137):
                got = first_block_at(f, pos, len(comp))
                assert got in offs or got == len(comp)
                assert got >= pos or pos == 0


class TestBgzfSharding:
    @pytest.mark.parametrize("n_shards", [2, 3, 5, 8])
    def test_exact_partition(self, tmp_path, rng, n_shards):
        """Records from all shards concatenate to exactly the file's
        records - no loss, no duplication, for shard counts that place
        boundaries inside blocks, on headers, and mid-record."""
        from shortseq_tpu.io.fastq import read_fastq_index

        data, reads = _make_fastq_bytes(rng)
        path = tmp_path / "s.fastq.bgz"
        path.write_bytes(bgzf_compress(data, block=512))
        size = path.stat().st_size
        got = []
        for s in range(n_shards):
            lo = s * size // n_shards
            hi = (s + 1) * size // n_shards
            d, starts, lengths = read_fastq_index(str(path),
                                                  byte_range=(lo, hi))
            for st, ln in zip(starts, lengths):
                got.append(bytes(d[st:st + ln]).decode())
        assert got == reads

    def test_empty_and_eof_only_files(self, tmp_path):
        from shortseq_tpu.io.bgzf import is_bgzf
        from shortseq_tpu.io.fastq import read_fastq_index

        eof_only = tmp_path / "e.bgz"
        eof_only.write_bytes(bgzf_block(b""))  # just the EOF marker
        assert is_bgzf(str(eof_only))
        d, starts, lengths = read_fastq_index(str(eof_only),
                                              byte_range=(0, 28))
        assert len(lengths) == 0

    def test_boundary_on_exact_block_start(self, tmp_path, rng):
        # A shard boundary placed exactly on a block header must assign
        # that block to the RIGHT shard (first_block_at(pos) == pos).
        from shortseq_tpu.io.bgzf import block_size_at
        from shortseq_tpu.io.fastq import read_fastq_index

        data, reads = _make_fastq_bytes(rng, n=120)
        comp = bgzf_compress(data, block=512)
        path = tmp_path / "b.bgz"
        path.write_bytes(comp)
        # Find the third block boundary.
        off = 0
        for _ in range(3):
            off += block_size_at(comp, off)
        got = []
        for lo, hi in ((0, off), (off, len(comp))):
            d, starts, lengths = read_fastq_index(str(path),
                                                  byte_range=(lo, hi))
            got.extend(bytes(d[s:s + l]).decode()
                       for s, l in zip(starts, lengths))
        assert got == reads

    def test_interior_empty_block_boundary(self, tmp_path, rng):
        # Spec-legal BGZF may hold interior EMPTY blocks (flushed empty
        # buffers, concatenated files with interior EOF markers).  A
        # shard whose first block follows an empty block mid-record must
        # walk back past it for its sync seed byte - otherwise it would
        # declare a false record boundary and duplicate the straddling
        # record.
        from shortseq_tpu.io.bgzf import block_size_at
        from shortseq_tpu.io.fastq import read_fastq_index

        data, reads = _make_fastq_bytes(rng, n=60)
        # Split so an empty block lands mid-record: cut NOT on a record
        # boundary (83 is deliberately unaligned).
        payloads = [data[:500], data[500:583], b"", data[583:]]
        comp = b"".join(bgzf_block(p) for p in payloads) + bgzf_block(b"")
        path = tmp_path / "empty_mid.bgz"
        path.write_bytes(comp)
        # Byte offset of the empty interior block.
        off = 0
        for p in payloads[:2]:
            off += block_size_at(comp, off)
        # lo inside the empty block -> b_lo = the block AFTER it, whose
        # decompressed start is mid-record.
        lo = off + 1
        got = []
        for byte_range in ((0, lo), (lo, len(comp))):
            d, starts, lengths = read_fastq_index(str(path),
                                                  byte_range=byte_range)
            got.extend(bytes(d[s:s + l]).decode()
                       for s, l in zip(starts, lengths))
        assert got == reads

    def test_all_leading_blocks_empty(self, tmp_path, rng):
        # Every block before the shard decompresses to nothing: the
        # shard starts at decompressed offset 0, a true record start.
        from shortseq_tpu.io.bgzf import block_size_at
        from shortseq_tpu.io.fastq import read_fastq_index

        data, reads = _make_fastq_bytes(rng, n=20)
        comp = (bgzf_block(b"") + bgzf_block(b"")
                + bgzf_block(data) + bgzf_block(b""))
        path = tmp_path / "lead_empty.bgz"
        path.write_bytes(comp)
        lo = block_size_at(comp, 0) + 1  # inside the second empty block
        d, starts, lengths = read_fastq_index(str(path),
                                              byte_range=(lo, len(comp)))
        got = [bytes(d[s:s + l]).decode()
               for s, l in zip(starts, lengths)]
        assert got == reads

    def test_plain_gzip_still_refused(self, tmp_path, rng):
        import gzip

        from shortseq_tpu.io.fastq import read_fastq_index

        data, _ = _make_fastq_bytes(rng)
        path = tmp_path / "p.fastq.gz"
        path.write_bytes(gzip.compress(data))
        with pytest.raises(ValueError, match="bgzip"):
            read_fastq_index(str(path), byte_range=(0, 10))

    def test_matrix_ranged(self, tmp_path, rng):
        from shortseq_tpu.io.fastq import read_fastq_matrix

        data, reads = _make_fastq_bytes(rng)
        path = tmp_path / "m.fastq.bgz"
        path.write_bytes(bgzf_compress(data, block=512))
        size = path.stat().st_size
        lens = []
        for s in range(3):
            lo, hi = s * size // 3, (s + 1) * size // 3
            mat, lengths = read_fastq_matrix(str(path), byte_range=(lo, hi))
            lens.extend(int(x) for x in lengths)
        assert lens == [len(r) for r in reads]

    def test_count_sharded_parity(self, tmp_path, rng):
        """count --shards on a .bgz: the multi-shard pipeline over
        compressed input must match collections.Counter exactly."""
        from shortseq_tpu.dist.pipeline import (count_fastq_sharded,
                                                table_to_counter)

        data, reads = _make_fastq_bytes(rng, n=200)
        path = tmp_path / "c.fastq.bgz"
        path.write_bytes(bgzf_compress(data, block=800))
        table = count_fastq_sharded(str(path), n_shards=4)
        counts = table_to_counter(table)
        assert {str(k): v for k, v in counts.items()} == \
            dict(collections.Counter(reads))

    def test_streaming_ingest_bgzf(self, tmp_path, rng, monkeypatch):
        """Above the streaming threshold a BGZF file takes the
        byte-range slice path (plain gzip keeps whole-file)."""
        import shortseq_tpu as sq

        data, reads = _make_fastq_bytes(rng, n=200)
        path = tmp_path / "t.fastq.bgz"
        path.write_bytes(bgzf_compress(data, block=700))
        monkeypatch.setenv("SHORTSEQ_TPU_STREAM_BYTES", "2000")
        counts = sq.read_and_count_fastq(str(path))
        assert {str(k): v for k, v in counts.items()} == \
            dict(collections.Counter(reads))
