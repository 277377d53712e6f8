"""Byte-range sharding without the native library + adversarial parser
inputs (round-1 VERDICT item 8).

fastq_sync is the pure-Python twin of the native ssq_fastq_sync
(csrc/fastq_index.cpp:116-134); these tests pin the two to identical
boundary decisions on adversarial buffers ('@'-leading quality lines,
CRLF, truncated final record) and prove the sharded pipeline works
end-to-end with SHORTSEQ_TPU_FORCE_PYTHON=1 (no g++ anywhere).
"""

import collections
import random
import subprocess
import sys

import numpy as np
import pytest

from shortseq_tpu.io.fastq import fastq_sync, read_fastq_matrix
from shortseq_tpu.io.native import get_lib
from tests.conftest import scrubbed_cpu_env

lib = get_lib()


def _fastq(reads, quals=None, newline=b"\n", truncate_final=False):
    out = []
    for i, r in enumerate(reads):
        q = (quals[i] if quals else "I" * len(r)).encode()
        rec = [b"@read_%d" % i, r.encode(), b"+", q]
        out.append(newline.join(rec))
    data = newline.join(out) + newline
    if truncate_final:
        # Chop mid-quality-line of the last record.
        data = data[: data.rfind(b"\n", 0, len(data) - 1) + 3]
    return data


def _rand_reads(rng, n, lo=8, hi=40):
    return ["".join(rng.choice("ACGT") for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


@pytest.mark.skipif(lib is None, reason="native sharder unavailable")
class TestSyncParity:
    def _check_all_offsets(self, data):
        n = len(data)
        for off in range(0, n + 1):
            assert fastq_sync(data, off) == lib.ssq_fastq_sync(data, n, off), off

    def test_plain_file(self):
        rng = random.Random(1)
        self._check_all_offsets(_fastq(_rand_reads(rng, 8)))

    def test_at_sign_quality_lines(self):
        # Quality 31 encodes as '@': a quality line can look like a header.
        rng = random.Random(2)
        reads = _rand_reads(rng, 8)
        quals = ["@" * len(r) for r in reads]
        self._check_all_offsets(_fastq(reads, quals))

    def test_plus_and_at_header_soup(self):
        rng = random.Random(3)
        reads = _rand_reads(rng, 6)
        data = _fastq(reads, quals=["@+@+" + "I" * (len(r) - 4) if len(r) > 4
                                    else "@" * len(r) for r in reads])
        self._check_all_offsets(data)

    def test_truncated_final_record(self):
        rng = random.Random(4)
        self._check_all_offsets(_fastq(_rand_reads(rng, 5), truncate_final=True))

    def test_crlf_newlines(self):
        rng = random.Random(5)
        self._check_all_offsets(_fastq(_rand_reads(rng, 5), newline=b"\r\n"))


class TestFallbackShardedParse:
    """Union of byte-range shards == full parse, computed WITHOUT the
    native library (subprocess with SHORTSEQ_TPU_FORCE_PYTHON=1)."""

    _SCRIPT = r"""
import sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
from shortseq_tpu.io.native import get_lib
assert get_lib() is None, "native lib must be disabled for this test"
from shortseq_tpu.io.fastq import read_fastq_matrix
path, n_shards = sys.argv[1], int(sys.argv[2])
import os
size = os.path.getsize(path)
full_mat, full_len = read_fastq_matrix(path)
rows = []
for s in range(n_shards):
    lo, hi = s * size // n_shards, (s + 1) * size // n_shards
    mat, lens = read_fastq_matrix(path, byte_range=(lo, hi))
    rows += [mat[i, :lens[i]].tobytes().decode("latin1")
             for i in range(len(lens))]
expect = [full_mat[i, :full_len[i]].tobytes().decode("latin1")
          for i in range(len(full_len))]
assert rows == expect, (len(rows), len(expect))
print("SHARD-FALLBACK-OK", len(rows))
"""

    def _run(self, path, n_shards=3):
        env = scrubbed_cpu_env()
        env["SHORTSEQ_TPU_FORCE_PYTHON"] = "1"
        proc = subprocess.run(
            [sys.executable, "-c", self._SCRIPT, str(path), str(n_shards)],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "SHARD-FALLBACK-OK" in proc.stdout

    def test_plain(self, tmp_path):
        rng = random.Random(7)
        p = tmp_path / "r.fastq"
        p.write_bytes(_fastq(_rand_reads(rng, 60)))
        self._run(p)

    def test_at_quality_and_truncated(self, tmp_path):
        rng = random.Random(8)
        reads = _rand_reads(rng, 40)
        quals = ["@" * len(r) for r in reads]
        p = tmp_path / "r.fastq"
        p.write_bytes(_fastq(reads, quals, truncate_final=True))
        self._run(p, n_shards=4)

    def test_counts_match_counter_without_native(self, tmp_path):
        # Full pipeline: count_fastq_sharded with multiple shards, no
        # native anything, vs collections.Counter.
        rng = random.Random(9)
        reads = [rng.choice(_rand_reads(rng, 10)) for _ in range(200)]
        p = tmp_path / "r.fastq"
        p.write_bytes(_fastq(reads))
        script = r"""
import sys, collections
sys.path.insert(0, "/root/repo")
from shortseq_tpu.io.native import get_lib
assert get_lib() is None
from shortseq_tpu.native_build import load
assert load() is None
from shortseq_tpu.dist.pipeline import count_fastq_sharded, table_to_counter
counts = table_to_counter(count_fastq_sharded(sys.argv[1], n_shards=3))
expect = collections.Counter(
    l.decode() for l in open(sys.argv[1], "rb").read().split(b"\n")[1::4] if l)
assert {str(k): v for k, v in counts.items()} == dict(expect)
print("PIPELINE-FALLBACK-OK", len(counts))
"""
        env = scrubbed_cpu_env()
        env["SHORTSEQ_TPU_FORCE_PYTHON"] = "1"
        proc = subprocess.run(
            [sys.executable, "-c", script, str(p)],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "PIPELINE-FALLBACK-OK" in proc.stdout


def test_crlf_rows_reach_validation_and_raise():
    """CRLF files keep the '\r' in the row (same as the reference's
    getline, which strips only '\n'); validation must reject it with the
    reference's error, identically on every path."""
    rng = random.Random(11)
    reads = _rand_reads(rng, 4)
    data = _fastq(reads, newline=b"\r\n")
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".fastq")
    try:
        os.write(fd, data)
        os.close(fd)
        mat, lens = read_fastq_matrix(path)
        assert all(mat[i, lens[i] - 1] == 13 for i in range(len(lens)))
        from shortseq_tpu.api.counter import count_matrix_device

        with pytest.raises(Exception, match="Unsupported base character"):
            count_matrix_device(mat, lens)
        from shortseq_tpu import oracle

        with pytest.raises(Exception, match="Unsupported base character"):
            oracle.encode_bytes(reads[0].encode() + b"\r")
    finally:
        os.unlink(path)


FUZZ_TRIALS = int(__import__("os").environ.get(
    "SHORTSEQ_TPU_FUZZ_TRIALS", "300"))


class TestParserTwinFuzz:
    """Differential fuzz of the documented byte-for-byte twin contract:
    the native sharder and the pure-Python fallback must make identical
    sync and index decisions on arbitrary (well-formed, corrupt, and
    random-binary) buffers - shards computed with and without g++ must
    agree.  4000-trial sweeps ran clean offline; a bounded sweep guards
    the contract in CI."""

    def _corpus(self, rng, trials):
        for _ in range(trials):
            kind = rng.random()
            if kind < 0.4:
                parts = []
                for _ in range(rng.randint(0, 10)):
                    ln = rng.randint(0, 40)
                    seq = bytes(rng.choice(b"ACGTN") for _ in range(ln))
                    parts.append(b"@r\n" + seq + b"\n+\n" + b"J" * ln + b"\n")
                data = b"".join(parts)
                if rng.random() < 0.3 and data.endswith(b"\n"):
                    data = data[:-1]
            elif kind < 0.7:
                lines = [bytes(rng.choice(b"ACGT@+!~ ")
                               for _ in range(rng.randint(0, 20)))
                         for _ in range(rng.randint(0, 20))]
                data = b"\n".join(lines) + (b"\n" if rng.random() < 0.5 else b"")
            else:
                data = bytes(rng.choice(range(1, 256))
                             for _ in range(rng.randint(0, 300)))
            yield data

    def test_sync_twin(self):
        import random

        from shortseq_tpu.io.fastq import fastq_sync
        from shortseq_tpu.io.native import get_lib

        lib = get_lib()
        if lib is None:
            pytest.skip("native io library unavailable")
        rng = random.Random(99)
        for data in self._corpus(rng, FUZZ_TRIALS):
            n = len(data)
            for off in {0, 1, n // 2, max(0, n - 1), n, n + 7}:
                assert lib.ssq_fastq_sync(data, n, off) == \
                    fastq_sync(data, off), (data[:80], off)

    def test_index_twin(self):
        import random

        from shortseq_tpu.io.fastq import fastq_line_index
        from shortseq_tpu.io.native import fastq_index_native

        if fastq_index_native(b"") is None:
            pytest.skip("native io library unavailable")
        rng = random.Random(5)
        for data in self._corpus(rng, FUZZ_TRIALS):
            _, n_starts, n_lens = fastq_index_native(data)
            buf = np.frombuffer(data, np.uint8)
            if buf.size == 0:
                assert len(n_starts) == 0
                continue
            s, e = fastq_line_index(buf)
            assert np.array_equal(np.asarray(n_starts), s.astype(np.int64)), \
                data[:80]
            assert np.array_equal(np.asarray(n_lens), (e - s)), data[:80]
