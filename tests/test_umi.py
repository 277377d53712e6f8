"""UMI subpackage: object parity (reference tests/unit_tests_umi.py:6-29)
plus the dedup capability the reference left unfinished."""

import numpy as np
import pytest

from shortseq_tpu.umi import (
    UMI, UMI3p, UMI5p, UMIboth, UMIFactory, dedup_umis, umi_adjacency,
)


class TestConstruct:
    def test_construct(self):
        UMI(); UMI5p(); UMI3p(); UMIboth()

    def test_factory_construct(self):
        f_5p = UMIFactory(len_5p=1)
        f_3p = UMIFactory(len_3p=1)
        f_bo = UMIFactory(len_5p=1, len_3p=1)
        assert isinstance(f_5p.from_bytes(b"ATGC"), UMI5p)
        assert isinstance(f_3p.from_bytes(b"ATGC"), UMI3p)
        assert isinstance(f_bo.from_bytes(b"ATGC"), UMIboth)

    def test_seq_basic(self):
        seq = b"GCGTAATAGGGGGTTTCGCTGTGGGGCGGCTAG"
        UMIFactory(len_5p=5).from_bytes(seq)

    def test_split_contents(self):
        u = UMIFactory(len_5p=3, len_3p=2).from_bytes(b"AAACGTACGTTT")
        assert str(u.umi5) == "AAA"
        assert str(u.umi3) == "TT"
        assert str(u.seq) == "CGTACGT"

    def test_eq_and_hash(self):
        f = UMIFactory(len_5p=2)
        a, b = f.from_bytes(b"AACGT"), f.from_bytes(b"AACGT")
        c = f.from_bytes(b"ATCGT")
        assert a == b and hash(a) == hash(b)
        assert a != c
        assert a != UMIFactory(len_3p=2).from_bytes(b"AACGT")

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="shorter than"):
            UMIFactory(len_5p=3, len_3p=3).from_bytes(b"ACGT")


class TestDedup:
    def test_unique(self):
        labels, reps = dedup_umis([b"AAAA", b"AAAT", b"AAAA"],
                                  method="unique")
        assert len(reps) == 2
        assert labels[0] == labels[2] != labels[1]

    def test_cluster_merges_within_threshold(self):
        # AAAA - AAAT (dist 1) - AATT (dist 1 from AAAT, 2 from AAAA):
        # one connected component; GGGG is its own.
        labels, reps = dedup_umis(
            [b"AAAA", b"AAAT", b"AATT", b"GGGG"], method="cluster")
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] != labels[0]
        assert len(reps) == 2

    def test_directional_respects_counts(self):
        # umi_tools directional: u absorbs v iff count(u) >= 2*count(v)-1.
        # AAAA x5 absorbs AAAT x2 (5 >= 3); CCCC x3 cannot absorb CCCG x3
        # (3 < 5), so CCCG stays its own cluster.
        umis = [b"AAAA"] * 5 + [b"AAAT"] * 2 + [b"CCCC"] * 3 + [b"CCCG"] * 3
        labels, reps = dedup_umis(umis, method="directional")
        assert labels[0] == labels[5]          # AAAT joined AAAA
        assert labels[7] != labels[10]         # CCCG did not join CCCC
        assert sorted(map(bytes, reps)) == [b"AAAA", b"CCCC", b"CCCG"]

    def test_adjacency_no_transitive_absorb(self):
        # adjacency: root absorbs direct neighbours only; AATT is distance
        # 2 from the root AAAA, so it survives as its own cluster even
        # though AAAT links them.
        umis = [b"AAAA"] * 5 + [b"AAAT"] * 2 + [b"AATT"] * 1
        labels, reps = dedup_umis(umis, method="adjacency")
        assert labels[0] == labels[5]
        assert labels[7] != labels[0]

    def test_different_lengths_never_merge(self):
        labels, reps = dedup_umis([b"AAAA", b"AAA"], method="cluster")
        assert labels[0] != labels[1]

    def test_invalid_umi_raises(self):
        with pytest.raises(Exception, match="Unsupported base character"):
            dedup_umis([b"AANA"])

    def test_empty(self):
        labels, reps = dedup_umis([])
        assert len(labels) == 0 and reps == []

    def test_adjacency_matrix_matches_strings(self):
        import itertools
        import jax.numpy as jnp

        from shortseq_tpu.ops.bitpack import pack_words

        umis = [b"ACGT", b"ACGA", b"TCGA", b"ACGT", b"AAAA"]
        uniq = sorted(set(umis))
        mat = np.zeros((len(uniq), 32), np.uint8)
        lengths = np.full(len(uniq), 4, np.int32)
        for i, u in enumerate(uniq):
            mat[i, :4] = np.frombuffer(u, np.uint8)
        words = pack_words(jnp.asarray(mat))
        adj = umi_adjacency(words, lengths, threshold=1)
        for i, j in itertools.product(range(len(uniq)), repeat=2):
            dist = sum(a != b for a, b in zip(uniq[i], uniq[j]))
            assert adj[i, j] == (dist <= 1), (uniq[i], uniq[j])


class TestCollapseKernels:
    def test_greedy_absorb_native_matches_python(self, monkeypatch):
        """The C collapse (csrc ssq_greedy_absorb) and its Python twin
        must produce identical labels on random sparse symmetric graphs,
        both methods, including count ties (stable order)."""
        import shortseq_tpu.io.native as native_mod
        from shortseq_tpu.umi import dedup as D

        if native_mod.get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(5)
        for trial in range(25):
            u = int(rng.integers(2, 120))
            nbrs = [set() for _ in range(u)]
            for _ in range(int(rng.integers(0, 3 * u))):
                a, b = rng.integers(0, u, size=2)
                if a != b:
                    nbrs[a].add(int(b))
                    nbrs[b].add(int(a))
            nbrs = [np.asarray(sorted(s), np.int64) for s in nbrs]
            counts = rng.integers(1, 6, size=u).astype(np.int64)  # many ties
            for directional in (False, True):
                got_native = D._greedy_absorb(nbrs, counts, directional)
                monkeypatch.setattr(native_mod, "greedy_absorb_native",
                                    lambda *a: None)
                got_py = D._greedy_absorb(nbrs, counts, directional)
                monkeypatch.undo()
                assert np.array_equal(got_native, got_py), \
                    (trial, directional)

    def test_components_matches_bfs_oracle(self):
        """Vectorized label propagation vs a simple BFS oracle."""
        from shortseq_tpu.umi import dedup as D

        rng = np.random.default_rng(9)
        for trial in range(25):
            u = int(rng.integers(1, 150))
            nbrs = [set() for _ in range(u)]
            for _ in range(int(rng.integers(0, 2 * u))):
                a, b = rng.integers(0, u, size=2)
                if a != b:
                    nbrs[a].add(int(b))
                    nbrs[b].add(int(a))
            nbrs = [np.asarray(sorted(s), np.int64) for s in nbrs]
            want = np.full(u, -1, np.int64)
            for seed in range(u):
                if want[seed] >= 0:
                    continue
                stack = [seed]
                want[seed] = seed
                while stack:
                    node = stack.pop()
                    for nbr in nbrs[node]:
                        if want[nbr] < 0:
                            want[nbr] = seed
                            stack.append(nbr)
            assert np.array_equal(D._components(nbrs), want), trial


class TestDedupReads:
    def test_groups_by_insert_then_clusters(self):
        from shortseq_tpu.umi import dedup_reads

        # Two inserts; insert 1 has UMIs AAAA x4 and AAAT x1 (collapses
        # directionally); insert 2 reuses AAAA but is a different molecule.
        reads = (["AAAA" + "CGTACGTACG"] * 4
                 + ["AAAT" + "CGTACGTACG"]
                 + ["AAAA" + "GGGGGGGGGG"] * 2)
        labels, molecules = dedup_reads(reads, len_5p=4)
        assert len(molecules) == 2
        assert labels[0] == labels[4] != labels[5]
        got = {(ins.decode(), umi.decode()) for ins, umi in molecules}
        assert got == {("CGTACGTACG", "AAAA"), ("GGGGGGGGGG", "AAAA")}

    def test_3p_and_both_ends(self):
        from shortseq_tpu.umi import dedup_reads

        reads = ["CCCCTTTT" + "AA", "CCCCTTTT" + "AA", "CCCCTTTT" + "AT"]
        labels, molecules = dedup_reads(reads, len_3p=2, method="cluster")
        # UMIs AA, AA, AT on the same insert: distance 1 -> one molecule.
        assert len(molecules) == 1 and len(set(labels)) == 1

        labels, molecules = dedup_reads(
            ["GG" + "ACGTACGT" + "TT"], len_5p=2, len_3p=2)
        assert molecules == [(b"ACGTACGT", b"GGTT")]

    def test_identical_umis_fast_path(self):
        from shortseq_tpu.umi import dedup_reads

        reads = ["ACGT" + "TTTTTTTT"] * 100
        labels, molecules = dedup_reads(reads, len_5p=4)
        assert len(molecules) == 1
        assert set(labels) == {0}

    def test_requires_umi_length(self):
        import pytest as _pytest

        from shortseq_tpu.umi import dedup_reads

        with _pytest.raises(ValueError, match="at least one UMI"):
            dedup_reads(["ACGT"])

    def test_too_short_read_raises(self):
        import pytest as _pytest

        from shortseq_tpu.umi import dedup_reads

        with _pytest.raises(ValueError, match="shorter than"):
            dedup_reads(["ACG"], len_5p=2, len_3p=2)


class TestDedupReadsRegressions:
    """Findings from review: empty-insert reads, negative lengths, and
    data-dependent validation on the identical-UMI fast path."""

    def test_entirely_umi_reads_share_one_group(self):
        from shortseq_tpu.umi import dedup_reads

        # Reads that are ALL UMI (empty insert): one group, directional
        # collapse applies across them.
        labels, molecules = dedup_reads(
        ["AAAA"] * 4 + ["AAAT"], len_3p=4)
        assert len(molecules) == 1
        assert molecules[0] == (b"", b"AAAA")
        assert set(labels) == {0}

    def test_negative_lengths_raise(self):
        from shortseq_tpu.umi import dedup_reads

        with pytest.raises(ValueError, match="non-negative"):
            dedup_reads(["ACGTACGT"] * 2, len_5p=-2, len_3p=4)

    def test_invalid_umi_raises_even_when_identical(self):
        from shortseq_tpu.umi import dedup_reads

        with pytest.raises(Exception, match="Unsupported base character"):
            dedup_reads(["NNNN" + "ACGTACGT"] * 3, len_5p=4)

    def test_umi_over_32nt_raises(self):
        from shortseq_tpu.umi import dedup_reads

        with pytest.raises(ValueError, match="longer than 32"):
            dedup_reads(["A" * 40] * 2, len_5p=33)

    def test_topk_overflow_rows_fall_back_dense(self, monkeypatch):
        # A clique larger than the per-row neighbour cap must fall back to
        # the dense single-row fetch and still return every neighbour.
        import shortseq_tpu.umi.dedup as dd

        umis = [b"AAAA", b"AAAT", b"AAAC", b"AAAG", b"ATAA", b"ACAA"]
        words, lengths = dd._pack_validate_umis(umis)
        import numpy as np

        full = dd._neighbor_lists(np.asarray(words), lengths, threshold=2)
        monkeypatch.setattr(dd, "_NEIGHBOR_K", 2)
        capped = dd._neighbor_lists(np.asarray(words), lengths, threshold=2)
        for a, b in zip(full, capped):
            assert sorted(a) == sorted(b)
        # Sanity: the clique really overflows the cap of 2.
        assert max(len(x) for x in full) > 2

    def test_blocked_adjacency_matches_single_block(self, rng):
        # The memory-bounded row-blocked sparse-adjacency path must agree
        # with the single-block (dense) computation on the same data.
        import shortseq_tpu.umi.dedup as dd

        inserts = ["".join(rng.choice("ACTG") for _ in range(20))
                   for _ in range(12)]
        reads = []
        for ins in inserts:
            reads += ["AACC" + ins] * 3 + ["AACT" + ins, "GGTT" + ins]
        l1, m1 = dd.dedup_reads(reads, len_5p=4)
        l2, m2 = dd.dedup_reads(reads, len_5p=4, _block=5)  # many blocks
        # Same partition (labels may be permuted) and same molecule set.
        import collections
        part1 = collections.defaultdict(set)
        part2 = collections.defaultdict(set)
        for i, (a, b) in enumerate(zip(l1, l2)):
            part1[int(a)].add(i)
            part2[int(b)].add(i)
        assert sorted(map(sorted, part1.values())) == \
            sorted(map(sorted, part2.values()))
        assert sorted(m1) == sorted(m2)

    @pytest.mark.parametrize("u", [127, 128, 129, 255, 257])
    def test_neighbor_lists_segment_boundaries(self, u):
        # The device extraction pre-reduces over 128-column segments; row
        # counts straddling the segment width (and the block padding that
        # rounds them up) must still reproduce the dense numpy adjacency.
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        rng = np.random.default_rng(u)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        mat = alpha[rng.integers(0, 4, size=(u, 6))]
        umis = [mat[i].tobytes() for i in range(u)]
        words, lengths = dd._pack_validate_umis(umis)
        words = np.asarray(words)
        got = dd._neighbor_lists(words, lengths, threshold=1)

        from shortseq_tpu.ops import hamming_pairwise

        dense = np.asarray(hamming_pairwise(words, words))
        for r in range(u):
            want = set(np.flatnonzero(dense[r] <= 1)) - {r}
            assert set(got[r]) == want, r

    @pytest.mark.parametrize("len_3p", [0, 3])
    def test_matrix_fast_path_matches_python_path(self, len_3p, monkeypatch):
        # The vectorized uniform-length grouping must be bit-identical to
        # the Python dict path: same labels, same molecule list (including
        # first-occurrence ordering and count tie-breaks).
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        rng = np.random.default_rng(9)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        mols = alpha[rng.integers(0, 4, size=(300, 15 + len_3p))]
        idx = rng.integers(0, 300, size=5000)
        reads = [mols[i].tobytes() for i in idx]

        if dd._unique_rows(np.zeros((2, 4), np.uint8)) is None:
            pytest.skip("native library unavailable; no fast path to diff")
        fast = dd.dedup_reads(reads, len_5p=5, len_3p=len_3p)
        monkeypatch.setattr(dd, "_unique_rows", lambda mat: None)
        slow = dd.dedup_reads(reads, len_5p=5, len_3p=len_3p)
        assert (fast[0] == slow[0]).all()
        assert fast[1] == slow[1]

    @pytest.mark.parametrize("len_3p", [0, 3])
    @pytest.mark.parametrize("method", ["directional", "cluster"])
    def test_ragged_path_matches_python_path(self, len_3p, method,
                                             monkeypatch):
        # Ragged read lists take the length-bucketed matrix path
        # (VERDICT r03 next-step 7); it must be bit-identical to the
        # Python dict path - labels, molecule list, first-occurrence
        # ordering, count tie-breaks - across interleaved lengths.
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        if dd._unique_rows(np.zeros((2, 4), np.uint8)) is None:
            pytest.skip("native library unavailable; no fast path to diff")

        rng = np.random.default_rng(17)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        len_5p = 5
        umi_len = len_5p + len_3p
        reads = []
        # Molecules at several insert lengths (incl. empty insert =
        # read length exactly umi_len), plus 1-edit UMI variants so the
        # clustering stage does real cross-bucket-ordering work.
        for ins_len in (0, 7, 12, 20):
            for _ in range(40):
                mol = alpha[rng.integers(0, 4, size=umi_len + ins_len)]
                base = mol.tobytes()
                reads += [base] * int(rng.integers(1, 5))
                if umi_len and rng.random() < 0.5:
                    var = mol.copy()
                    pos = int(rng.integers(0, umi_len))
                    # Mutate within the UMI region (5' end or 3' tail).
                    j = pos if pos < len_5p else len(var) - (umi_len - pos)
                    var[j] = alpha[(np.flatnonzero(alpha == var[j])[0] + 1)
                                   % 4]
                    reads.append(var.tobytes())
        perm = rng.permutation(len(reads))
        reads = [reads[i] for i in perm]

        calls = []
        real_ragged = dd._dedup_reads_ragged
        monkeypatch.setattr(
            dd, "_dedup_reads_ragged",
            lambda *a, **k: calls.append(1) or real_ragged(*a, **k))
        fast = dd.dedup_reads(reads, len_5p=len_5p, len_3p=len_3p,
                              method=method)
        assert calls, "ragged fast path was not taken"
        monkeypatch.setattr(dd, "_unique_rows", lambda mat: None)
        slow = dd.dedup_reads(reads, len_5p=len_5p, len_3p=len_3p,
                              method=method)
        assert (fast[0] == slow[0]).all()
        assert fast[1] == slow[1]

    def test_ragged_too_short_read_raises_reference_error(self):
        from shortseq_tpu.umi import dedup_reads

        with pytest.raises(ValueError, match="shorter than"):
            dedup_reads(["ACGTACGTACGT", "ACG"], len_5p=2, len_3p=2)

    def test_ragged_invalid_base_raises(self):
        from shortseq_tpu.umi import dedup_reads

        with pytest.raises(Exception, match="Unsupported base character"):
            dedup_reads(["NNNN" + "ACGTACGT", "NNNN" + "ACGT"], len_5p=4)

    def test_umis_fast_path_matches_python_path(self, monkeypatch):
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        rng = np.random.default_rng(11)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        pool = alpha[rng.integers(0, 4, size=(200, 10))]
        umis = [pool[i].tobytes() for i in rng.integers(0, 200, size=3000)]

        fast = dd.dedup_umis(umis, threshold=1, method="directional")
        monkeypatch.setattr(dd, "_unique_rows", lambda mat: None)
        slow = dd.dedup_umis(umis, threshold=1, method="directional")
        assert (fast[0] == slow[0]).all()
        assert fast[1] == slow[1]

    def test_variable_length_umis(self):
        # Mixed lengths take the length-bucketed path; unequal lengths
        # never cluster together.
        from shortseq_tpu.umi import dedup_umis

        umis = [b"AAAA", b"AAA", b"AAAA", b"AAAT", b"AAA"]
        labels, reps = dedup_umis(umis, threshold=1, method="cluster")
        assert labels[0] == labels[2] == labels[3] != labels[1]
        assert labels[1] == labels[4]

    def test_ragged_umis_match_python_path(self, monkeypatch):
        # The length-bucketed dedup_umis path must be bit-identical to
        # the Python dict path (labels, representatives, ordering).
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        if dd._unique_rows(np.zeros((2, 4), np.uint8)) is None:
            pytest.skip("native library unavailable; no fast path to diff")
        rng = np.random.default_rng(23)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        umis = []
        for lng in (6, 8, 11):
            pool = alpha[rng.integers(0, 4, size=(60, lng))]
            for _ in range(800):
                u = pool[rng.integers(0, 60)]
                if rng.random() < 0.3:
                    u = u.copy()
                    u[rng.integers(0, lng)] = alpha[rng.integers(0, 4)]
                umis.append(u.tobytes())
        perm = rng.permutation(len(umis))
        umis = [umis[i] for i in perm]

        calls = []
        real_ragged = dd._dedup_umis_ragged
        real_unique = dd._unique_rows
        monkeypatch.setattr(
            dd, "_dedup_umis_ragged",
            lambda *a, **k: calls.append(1) or real_ragged(*a, **k))
        for method in ("directional", "cluster", "adjacency", "unique"):
            calls.clear()
            monkeypatch.setattr(dd, "_unique_rows", real_unique)
            fast = dd.dedup_umis(umis, threshold=1, method=method)
            assert calls, "ragged fast path was not taken"
            monkeypatch.setattr(dd, "_unique_rows", lambda mat: None)
            slow = dd.dedup_umis(umis, threshold=1, method=method)
            assert (fast[0] == slow[0]).all(), method
            assert fast[1] == slow[1], method

    def test_overflow_beyond_overflow_k_falls_back_dense(self, monkeypatch):
        # Rows exceeding even the overflow re-extraction cap must land on
        # the dense batched path and still return exact neighbour sets.
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        umis = [b"AAAA", b"AAAT", b"AAAC", b"AAAG", b"ATAA", b"ACAA",
                b"AGAA", b"TAAA"]
        words, lengths = dd._pack_validate_umis(umis)
        full = dd._neighbor_lists(np.asarray(words), lengths, threshold=2)
        monkeypatch.setattr(dd, "_NEIGHBOR_K", 2)
        monkeypatch.setattr(dd, "_OVERFLOW_K", 3)
        capped = dd._neighbor_lists(np.asarray(words), lengths, threshold=2)
        for a, b in zip(full, capped):
            assert sorted(a) == sorted(b)
        assert max(len(x) for x in full) > 3  # dense tier really exercised

    def test_matrix_input_matches_list_input(self):
        # dedup_reads / dedup_umis accept an [N, L] uint8 matrix (the
        # zero-object production path) and must agree with list input.
        import numpy as np

        from shortseq_tpu.umi import dedup_reads, dedup_umis

        rng = np.random.default_rng(13)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        mols = alpha[rng.integers(0, 4, size=(80, 18))]
        mat = mols[rng.integers(0, 80, size=1500)]
        reads = [mat[i].tobytes() for i in range(len(mat))]

        lm, mm = dedup_reads(mat, len_5p=6)
        ll, ml = dedup_reads(reads, len_5p=6)
        assert (lm == ll).all() and mm == ml

        um = mat[:, :8].copy()
        lm2, rm2 = dedup_umis(um, threshold=1)
        ll2, rl2 = dedup_umis([um[i].tobytes() for i in range(len(um))],
                              threshold=1)
        assert (lm2 == ll2).all() and rm2 == rl2

        with pytest.raises(TypeError, match="2-D uint8"):
            dedup_reads(mat.astype(np.int32), len_5p=6)
        with pytest.raises(ValueError, match="shorter than the UMI"):
            dedup_reads(mat[:, :4], len_5p=6)

    @pytest.mark.parametrize("method", ["cluster", "adjacency",
                                        "directional"])
    @pytest.mark.parametrize("threshold", [1, 2])
    def test_fast_slow_differential_sweep(self, method, threshold,
                                          monkeypatch):
        # Randomized fast-vs-Python differential across methods and
        # thresholds (seeded); partitions and molecule sets must be
        # bit-identical.
        import numpy as np

        import shortseq_tpu.umi.dedup as dd

        seed = (dd._METHODS.index(method) + 1) * 1000 + threshold
        rng = np.random.default_rng(seed)  # stable (no str hash salt)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        pool = alpha[rng.integers(0, 4, size=(60, 6))]
        umis = [pool[i].tobytes() for i in rng.integers(0, 60, size=800)]

        fast = dd.dedup_umis(umis, threshold=threshold, method=method)
        monkeypatch.setattr(dd, "_unique_rows", lambda mat: None)
        slow = dd.dedup_umis(umis, threshold=threshold, method=method)
        assert (fast[0] == slow[0]).all()
        assert fast[1] == slow[1]

    def test_1d_string_arrays_still_accepted(self):
        # numpy 1-D arrays of bytes/str scalars flow through the list
        # path (regression: the 2-D matrix guard must not reject them).
        import numpy as np

        from shortseq_tpu.umi import dedup_umis

        labels, reps = dedup_umis(np.array([b"AAAA", b"AAAT", b"GGGG"]),
                                  threshold=1)
        assert labels[0] == labels[1] != labels[2]
        labels2, _ = dedup_umis(np.array(["AAAA", "AAAT"]), threshold=1)
        assert labels2[0] == labels2[1]
