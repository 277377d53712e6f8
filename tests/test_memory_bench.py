"""Deep-size measurement + the reference-shaped memory/time plots.

The reference asserts exact object footprints and publishes asizeof-based
plots (reference tests/benchmark.py:44-79, unit_tests_main.py:78-86,
:499-500); utils.memory.deep_sizeof is the pympler-free equivalent and
must reproduce the exact published sizes for the native objects."""

from pathlib import Path

import pytest

import shortseq_tpu as sq
from shortseq_tpu.utils.memory import deep_sizeof


class TestDeepSizeof:
    def test_native_object_footprints(self):
        if sq.BACKEND != "native":
            pytest.skip("exact footprints are the native extension's")
        # Reference-published sizes: 32 B fixed (<=32 nt), 48 B fixed
        # (33-96 nt), 64-288 B (97-1024, 32 + 8/32-nt-block).
        assert deep_sizeof(sq.pack("A" * 16)) == 32
        assert deep_sizeof(sq.pack("A" * 32)) == 32
        assert deep_sizeof(sq.pack("A" * 33)) == 48
        assert deep_sizeof(sq.pack("A" * 96)) == 48
        assert deep_sizeof(sq.pack("A" * 97)) == 64
        assert deep_sizeof(sq.pack("A" * 1024)) == 288

    def test_matches_getsizeof_for_flat_objects(self):
        import sys

        for obj in ("ACGT" * 8, b"ACGT" * 8, 12345):
            assert deep_sizeof(obj) == sys.getsizeof(obj)

    def test_counts_shared_substructure_once(self):
        shared = list(range(100))
        one = deep_sizeof([shared])
        two = deep_sizeof([shared, shared])
        assert two < 2 * one  # the inner list is counted once

    def test_nested_exceeds_flat(self):
        inner = b"x" * 1000
        assert deep_sizeof([inner]) > 1000


def test_plots_generate(tmp_path, monkeypatch):
    """--plots writes the reference's three SVG figures (tiny problem
    sizes here; the committed docs/plots/*.svg come from the real run)."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("svg")
    import matplotlib.pyplot as plt

    import benchmarks.benchmark as bm

    monkeypatch.setattr(bm, "_PLOT_LENGTHS", [16, 33])
    monkeypatch.setattr(
        bm, "_device_pack_per_seq", lambda length, **kw: 1e-9)
    monkeypatch.setattr(
        bm, "_device_hamming_per_pair", lambda length, **kw: 1e-10)
    bm.plot_memory(plt, tmp_path)
    bm.plot_construction(plt, tmp_path, n=50)
    bm.plot_hamming(plt, tmp_path, n=50)
    for name in ("mem_by_length", "from_bytes_time", "edit_distance_time"):
        svg = tmp_path / f"{name}.svg"
        assert svg.exists() and svg.stat().st_size > 1000
        assert b"<svg" in svg.read_bytes()[:500]


def test_committed_plots_exist():
    plots = Path(__file__).resolve().parent.parent / "docs" / "plots"
    for name in ("mem_by_length", "from_bytes_time", "edit_distance_time"):
        assert (plots / f"{name}.svg").exists(), name
