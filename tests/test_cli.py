"""CLI smoke tests (python -m shortseq_tpu)."""

import collections
import json
import random

import pytest

import shortseq_tpu as sq
from shortseq_tpu.__main__ import main


@pytest.fixture
def fastq(tmp_path):
    rng = random.Random(11)
    reads = ["".join(rng.choice("ACGT") for _ in range(rng.randint(8, 30)))
             for _ in range(150)] * 2
    path = tmp_path / "cli.fastq"
    with open(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n".encode())
    return path, reads


def test_count_tsv(fastq, tmp_path, capsys):
    path, reads = fastq
    out = tmp_path / "counts.tsv"
    assert main(["count", str(path), "-o", str(out)]) == 0
    rows = [line.split("\t") for line in out.read_text().splitlines()]
    got = {seq: int(c) for seq, c in rows}
    assert got == dict(collections.Counter(reads))
    # Sorted by descending count.
    counts = [int(c) for _, c in rows]
    assert counts == sorted(counts, reverse=True)


def test_count_json_top(fastq, capsys):
    path, reads = fastq
    assert main(["count", str(path), "--json", "--top", "5"]) == 0
    captured = capsys.readouterr()
    got = json.loads(captured.out)
    assert len(got) == 5
    ref = collections.Counter(reads)
    for seq, c in got.items():
        assert ref[seq] == c
    assert "unique sequences" in captured.err


def test_count_sharded_pipeline(fastq, tmp_path, capsys):
    """--shards routes through the resumable byte-range production
    pipeline; the table must equal the single-shot count exactly."""
    path, reads = fastq
    out = tmp_path / "sharded.tsv"
    assert main(["count", str(path), "--shards", "3", "-o", str(out)]) == 0
    rows = [line.split("\t") for line in out.read_text().splitlines()]
    assert {s: int(c) for s, c in rows} == dict(collections.Counter(reads))
    assert "sharded count: 3 shard" in capsys.readouterr().err


def test_count_sharded_bgzf(fastq, tmp_path, capsys):
    """`count --shards` on a .bgz file: the byte-range pipeline shards
    compressed input on BGZF block boundaries (io/bgzf.py)."""
    from tests.test_bgzf import bgzf_compress

    path, reads = fastq
    bgz = tmp_path / "cli.fastq.bgz"
    bgz.write_bytes(bgzf_compress(path.read_bytes(), block=600))
    out = tmp_path / "bgz.tsv"
    assert main(["count", str(bgz), "--shards", "3", "-o", str(out)]) == 0
    rows = [line.split("\t") for line in out.read_text().splitlines()]
    assert {s: int(c) for s, c in rows} == dict(collections.Counter(reads))


def test_count_checkpoint_resume(fastq, tmp_path, capsys):
    """--checkpoint spills per-shard tables; a rerun loads them instead
    of recounting (manifest-compatible resume), same table both times."""
    path, reads = fastq
    ckpt = tmp_path / "ckpt"
    args = ["count", str(path), "--shards", "2", "--checkpoint", str(ckpt),
            "--top", "4"]
    assert main(args) == 0
    first = capsys.readouterr().out
    spills = sorted(p.name for p in ckpt.glob("counts_*.npz"))
    assert len(spills) == 2
    # Resume: spills untouched (loaded, not rewritten), identical output.
    mtimes = {p.name: p.stat().st_mtime_ns for p in ckpt.glob("counts_*.npz")}
    assert main(args) == 0
    second = capsys.readouterr().out
    assert first == second
    assert mtimes == {p.name: p.stat().st_mtime_ns
                      for p in ckpt.glob("counts_*.npz")}
    ref = collections.Counter(reads)
    for line in first.strip().splitlines():
        seq, c = line.split("\t")
        assert ref[seq] == int(c)


def test_count_sharded_rejects_host_engine(fastq, tmp_path, capsys):
    path, _ = fastq
    assert main(["count", str(path), "--shards", "2",
                 "--engine", "host"]) == 2
    assert "not available with --shards" in capsys.readouterr().err


def test_count_shards_must_be_positive(fastq, capsys):
    path, _ = fastq
    with pytest.raises(SystemExit):
        main(["count", str(path), "--shards", "0"])


def test_pack_command(capsys):
    assert main(["pack", "ACGT"]) == 0
    out = capsys.readouterr().out
    fields = out.strip().split("\t")
    assert fields[0] == "ACGT" and fields[1] == "ShortSeq64"
    assert f"hash={hash(sq.pack('ACGT'))}" in fields
    # Block hex matches the oracle encoding (A=00 C=01 G=11 T=10 LSB-first).
    assert fields[-1] == "blocks=00000000000000b4"


class TestUmiCommand:
    def test_umi_dedup_tsv(self, tmp_path, capsys):
        from shortseq_tpu.__main__ import main

        reads = ["AACCGG" + "ACGTACGTACGTACGT"] * 5 + \
                ["AACCGT" + "ACGTACGTACGTACGT"] * 1 + \
                ["TTGGCC" + "ACGTACGTACGTACGT"] * 3
        path = tmp_path / "u.fastq"
        with open(path, "w") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
        rc = main(["umi", str(path), "--len-5p", "6"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        rows = [line.split("\t") for line in out]
        assert len(rows) == 2  # AACCGT collapses into AACCGG
        assert rows[0] == ["ACGTACGTACGTACGT", "AACCGG", "6"]
        assert rows[1] == ["ACGTACGTACGTACGT", "TTGGCC", "3"]

    def test_umi_requires_a_length(self, tmp_path, capsys):
        from shortseq_tpu.__main__ import main

        path = tmp_path / "u.fastq"
        path.write_text("@r\nACGT\n+\nIIII\n")
        rc = main(["umi", str(path)])
        assert rc == 2
        assert "len-5p" in capsys.readouterr().err

    def test_umi_variable_length_reads(self, tmp_path, capsys):
        from shortseq_tpu.__main__ import main

        reads = ["AACC" + "ACGT" * 4, "AACC" + "ACGT" * 3]
        path = tmp_path / "v.fastq"
        with open(path, "w") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
        rc = main(["umi", str(path), "--len-5p", "4"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 2  # different inserts never merge
