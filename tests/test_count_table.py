"""CountTable: lazy count-table reads must agree with the materialized
dict on every surface (len/total/most_common/lookups), for both engines,
without materializing the full table (VERDICT.md round-2 task #2)."""

import collections

import numpy as np
import pytest

import shortseq_tpu as sq
from tests.conftest import rand_sequence


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(path)


@pytest.fixture(scope="module")
def fastq_and_reads(tmp_path_factory):
    import random

    rng = random.Random(0xBEEF)
    pool = ([rand_sequence(rng, rng.randint(1, 32)) for _ in range(40)]
            + [rand_sequence(rng, rng.randint(33, 96)) for _ in range(10)]
            + [rand_sequence(rng, rng.randint(97, 300)) for _ in range(5)])
    reads = [rng.choice(pool) for _ in range(600)]
    path = _write_fastq(tmp_path_factory.mktemp("ct") / "r.fastq", reads)
    return path, reads


ENGINES = ("host", "device")


@pytest.fixture(params=ENGINES)
def table_and_expect(request, fastq_and_reads):
    path, reads = fastq_and_reads
    from shortseq_tpu.io.native import get_lib

    if request.param == "host" and get_lib() is None:
        pytest.skip("native library unavailable")
    table = sq.read_and_count_fastq_table(path, engine=request.param)
    return table, collections.Counter(reads)


class TestCountTable:
    def test_len_and_total(self, table_and_expect):
        table, expect = table_and_expect
        assert len(table) == len(expect)
        assert table.total() == sum(expect.values())

    def test_most_common_top_n(self, table_and_expect):
        table, expect = table_and_expect
        for n in (1, 5, 20):
            got = table.most_common(n)
            assert len(got) == min(n, len(expect))
            # counts must be the n largest (multiset equality), and
            # every returned (key, count) must be a true table entry
            want_counts = sorted(expect.values(), reverse=True)[:n]
            assert sorted((c for _, c in got), reverse=True) == want_counts
            for k, c in got:
                assert expect[str(k)] == c
            # deterministic order: count desc, key asc
            keys = [(-c, str(k)) for k, c in got]
            assert keys == sorted(keys)

    def test_most_common_full(self, table_and_expect):
        table, expect = table_and_expect
        got = table.most_common()
        assert {str(k): c for k, c in got} == dict(expect)

    def test_lookups(self, table_and_expect):
        table, expect = table_and_expect
        some = list(expect)[:25]
        for seq in some:
            assert seq in table
            assert table[seq] == expect[seq]
            assert table[seq.encode()] == expect[seq]
            assert table[sq.pack(seq)] == expect[seq]
            assert table.get(seq) == expect[seq]
        absent = "ACGTACGTTGCA"
        while absent in expect:
            absent += "A"
        assert absent not in table
        assert table.get(absent) == 0
        with pytest.raises(KeyError):
            table[absent]
        # non-sequence / invalid keys are simply absent
        assert table.get(123) == 0
        assert table.get("NNNN") == 0
        assert 123 not in table

    def test_values_multiset(self, table_and_expect):
        """values(): the reference's dedup-parity oracle
        (sorted(counter.values()), unit_tests_profiling.py:136) without
        materializing any key objects."""
        table, expect = table_and_expect
        vals = table.values()
        assert sorted(vals.tolist()) == sorted(expect.values())
        assert int(vals.sum()) == table.total()

    def test_to_counter_matches_eager(self, table_and_expect):
        table, expect = table_and_expect
        counter = table.to_counter()
        assert {str(k): v for k, v in counter.items()} == dict(expect)
        assert isinstance(counter, sq.ShortSeqCounter)

    def test_engines_agree(self, fastq_and_reads):
        path, reads = fastq_and_reads
        from shortseq_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("native library unavailable")
        th = sq.read_and_count_fastq_table(path, engine="host")
        td = sq.read_and_count_fastq_table(path, engine="device")
        assert len(th) == len(td)
        assert th.total() == td.total()
        # Count multisets agree exactly; keys agree above the boundary
        # count (ties AT the boundary may surface different members per
        # engine, like Counter insertion order - see most_common docs).
        h10 = [(str(k), c) for k, c in th.most_common(10)]
        d10 = [(str(k), c) for k, c in td.most_common(10)]
        assert [c for _, c in h10] == [c for _, c in d10]
        boundary = h10[-1][1]
        assert ({kv for kv in h10 if kv[1] > boundary}
                == {kv for kv in d10 if kv[1] > boundary})


def test_from_merged_roundtrip(tmp_path):
    """CountTable.from_merged over a distributed prefix table."""
    reads = ["ACGT", "ACGT", "TTTT", "ACGTACGT"] * 5
    path = _write_fastq(tmp_path / "m.fastq", reads)
    from shortseq_tpu.count.table import CountTable
    from shortseq_tpu.dist import read_and_count_fastq_distributed

    table = read_and_count_fastq_distributed(path)
    ct = CountTable.from_merged(table)
    expect = collections.Counter(reads)
    assert len(ct) == len(expect)
    assert ct.total() == len(reads)
    assert {str(k): c for k, c in ct.most_common()} == dict(expect)
    assert ct["ACGT"] == 10


class TestPoisonedCounts:
    """Every lazy read must honor the int32-wrap poison contract: a -1
    count from unique_count's wrap detection means the table is invalid,
    and silently dropping it (device top_k selects by signed value!)
    would return a top list missing the true most-frequent key."""

    def _poisoned_device_table(self):
        import jax.numpy as jnp

        from shortseq_tpu.count.device import PAD_LENGTH
        from shortseq_tpu.count.table import CountTable, _Bucket

        words = jnp.asarray(np.arange(8, dtype=np.uint32).reshape(4, 2))
        lengths = jnp.asarray(np.array([8, 8, 8, PAD_LENGTH], np.int32))
        counts = jnp.asarray(np.array([5, -1, 2, 0], np.int32))
        return CountTable([_Bucket(words, lengths, counts, 3, device=True)])

    def _poisoned_host_table(self):
        from shortseq_tpu.count.table import CountTable

        words = np.arange(6, dtype=np.uint32).reshape(3, 2)
        lengths = np.full(3, 8, np.int32)
        counts = np.array([5, -1, 2], np.int64)
        return CountTable.from_host_tables([(words, lengths, counts)])

    @pytest.mark.parametrize("maker", ["_poisoned_device_table",
                                       "_poisoned_host_table"])
    def test_most_common_raises(self, maker):
        table = getattr(self, maker)()
        with pytest.raises(OverflowError, match="int32"):
            table.most_common(2)
        with pytest.raises(OverflowError, match="int32"):
            table.most_common()

    @pytest.mark.parametrize("maker", ["_poisoned_device_table",
                                       "_poisoned_host_table"])
    def test_total_raises(self, maker):
        table = getattr(self, maker)()
        with pytest.raises(OverflowError):
            table.total()

    @pytest.mark.parametrize("maker", ["_poisoned_device_table",
                                       "_poisoned_host_table"])
    def test_to_counter_raises(self, maker):
        table = getattr(self, maker)()
        with pytest.raises(OverflowError, match="int32"):
            table.to_counter()

    @pytest.mark.parametrize("maker", ["_poisoned_device_table",
                                       "_poisoned_host_table"])
    def test_values_raises(self, maker):
        table = getattr(self, maker)()
        with pytest.raises(OverflowError, match="int32"):
            table.values()


@pytest.mark.parametrize("engine", ENGINES)
def test_empty_reads_as_keys(tmp_path, engine):
    """Zero-length reads are live keys (the reference's empty singleton /
    hash-0 collision subtlety): len/total/lookup/most_common must all see
    them on both engines."""
    from shortseq_tpu.io.native import get_lib

    if engine == "host" and get_lib() is None:
        pytest.skip("native library unavailable")
    reads = ["", "ACGT", "", "A", "ACGT"]
    path = _write_fastq(tmp_path / "e.fastq", reads)
    t = sq.read_and_count_fastq_table(path, engine=engine)
    assert len(t) == 3 and t.total() == 5
    assert t[""] == 2 and t["A"] == 1 and t["ACGT"] == 2
    assert {str(k): v for k, v in t.most_common()} == \
        dict(collections.Counter(reads))


def test_empty_table():
    from shortseq_tpu.count.table import CountTable

    t = CountTable([])
    assert len(t) == 0
    assert t.total() == 0
    assert t.most_common(5) == []
    assert t.most_common() == []
    assert "ACGT" not in t
    assert t.to_counter() == {}


def test_random_corpus_differential(tmp_path):
    """Randomized CountTable-vs-collections.Counter sweep across mixed
    widths, empty reads, skewed duplication, and both engines: every lazy
    read surface must agree with the oracle on every corpus."""
    import random

    from shortseq_tpu.io.native import get_lib

    rng = random.Random(0x5EED)
    engines = ["device"] + (["host"] if get_lib() is not None else [])
    for trial in range(6):
        pool = []
        for _ in range(rng.randint(1, 25)):
            lo, hi = rng.choice([(1, 32), (33, 96), (97, 200), (0, 0)])
            pool.append(rand_sequence(rng, rng.randint(lo, hi)))
        reads = [rng.choice(pool) for _ in range(rng.randint(1, 400))]
        path = _write_fastq(tmp_path / f"rc{trial}.fastq", reads)
        expect = collections.Counter(reads)
        for engine in engines:
            t = sq.read_and_count_fastq_table(path, engine=engine)
            assert len(t) == len(expect)
            assert t.total() == len(reads)
            assert sorted(t.values().tolist()) == sorted(expect.values())
            assert {str(k): v for k, v in t.most_common()} == dict(expect)
            n = rng.randint(1, 5)
            top = t.most_common(n)
            want = sorted(expect.values(), reverse=True)[:n]
            assert sorted((c for _, c in top), reverse=True) == want
            for s in rng.sample(list(expect), min(5, len(expect))):
                assert t[s] == expect[s]


def test_cli_top_uses_lazy_table(tmp_path, capsys, monkeypatch):
    """`count --top N` must route through the lazy table (no full
    materialization): to_counter is forbidden via monkeypatch."""
    reads = ["ACGT"] * 5 + ["TTTT"] * 3 + ["GGGG"]
    path = _write_fastq(tmp_path / "c.fastq", reads)
    from shortseq_tpu import __main__ as cli
    from shortseq_tpu.count.table import CountTable

    def _boom(self):
        raise AssertionError("--top path must not materialize the dict")

    monkeypatch.setattr(CountTable, "to_counter", _boom)
    rc = cli.main(["count", str(path), "--top", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["ACGT\t5", "TTTT\t3"]
