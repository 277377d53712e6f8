"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. int32 count wraps that land positive are detected (float32 shadow sum
   poisons the group to -1, so every materialization path raises).
2. unique_count with n_out smaller than the true unique count raises from
   counts_to_host instead of silently truncating.
3. Checkpoint resume refuses a same-size but content-modified input file
   (manifest fingerprint).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from shortseq_tpu.count.checkpoint import file_fingerprint
from shortseq_tpu.count.device import counts_to_host, unique_count


def _one_key_table(weights, n_out=None):
    n = len(weights)
    words = np.zeros((n, 2), np.uint32)
    words[:, 0] = 0x78
    lengths = np.full(n, 4, np.int32)
    return unique_count(jnp.asarray(words), jnp.asarray(lengths),
                        jnp.asarray(np.asarray(weights, np.int32)),
                        n_out=n_out)


class TestCountWrapDetection:
    def test_positive_landing_wrap_is_poisoned(self):
        # 3 x 1_900_000_000 = 5.7e9 = +1_405_032_704 mod 2^32: positive,
        # so the old min() < 0 check missed it (ADVICE.md item 2).
        t = _one_key_table([1_900_000_000, 1_900_000_000, 1_900_000_000])
        with pytest.raises(OverflowError):
            counts_to_host(*t)

    def test_negative_landing_wrap_still_raises(self):
        t = _one_key_table([2_000_000_000, 2_000_000_000])
        with pytest.raises(OverflowError):
            counts_to_host(*t)

    def test_large_but_legal_counts_survive(self):
        t = _one_key_table([1_000_000_000, 1_000_000_000])
        [(key, count)] = counts_to_host(*t)
        assert count == 2_000_000_000

    def test_update_counter_raises_on_poisoned_table(self):
        from shortseq_tpu.api.counter import (ShortSeqCounter,
                                              update_counter_from_host_table)

        with pytest.raises(OverflowError):
            update_counter_from_host_table(
                ShortSeqCounter(), np.zeros((1, 2), np.uint32),
                np.array([4], np.int32), np.array([-1], np.int32))


class TestNOutTruncation:
    def test_too_small_n_out_raises(self):
        # 4 distinct keys forced into a 2-row table (ADVICE.md item 3).
        words = np.zeros((4, 2), np.uint32)
        words[:, 0] = np.arange(4) + 1
        lengths = np.full(4, 4, np.int32)
        t = unique_count(jnp.asarray(words), jnp.asarray(lengths),
                         jnp.ones(4, jnp.int32), n_out=2)
        assert int(t[3]) == 4  # n_unique reports the true group count
        with pytest.raises(ValueError, match="n_out too small"):
            counts_to_host(*t)

    def test_exact_n_out_is_fine(self):
        words = np.zeros((4, 2), np.uint32)
        words[:, 0] = np.arange(4) % 2
        lengths = np.full(4, 4, np.int32)
        t = unique_count(jnp.asarray(words), jnp.asarray(lengths),
                         jnp.ones(4, jnp.int32), n_out=2)
        table = counts_to_host(*t)
        assert sorted(c for _, c in table) == [2, 2]


class TestManifestFingerprint:
    def test_same_size_modification_refused(self, tmp_path):
        from shortseq_tpu.config import PipelineConfig
        from shortseq_tpu.dist.pipeline import count_fastq_sharded

        fq = tmp_path / "r.fastq"
        fq.write_bytes(b"@r0\nACGT\n+\nIIII\n@r1\nGGCC\n+\nIIII\n")
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"))
        count_fastq_sharded(str(fq), n_shards=2, config=cfg)
        # One corrected base, identical size: resume must refuse.
        fq.write_bytes(b"@r0\nACGT\n+\nIIII\n@r1\nGGCG\n+\nIIII\n")
        with pytest.raises(ValueError, match="manifest|resume"):
            count_fastq_sharded(str(fq), n_shards=2, config=cfg)

    def test_fingerprint_reads_head_and_tail(self, tmp_path):
        p = tmp_path / "big.bin"
        data = bytearray(200_000)
        p.write_bytes(bytes(data))
        f1 = file_fingerprint(p)
        data[-1] = 7  # tail-only change, same size
        p.write_bytes(bytes(data))
        assert file_fingerprint(p) != f1


def test_update_from_table_small_int_merge():
    # Regression: CPython interns ints in [-5, 256], so "key existed"
    # must be detected by dict size, never by comparing the SetDefault
    # result to the freshly created count object (two merges of count 1
    # silently yielded 1).
    import numpy as np

    from shortseq_tpu.api.counter import (ShortSeqCounter,
                                          update_counter_from_host_table)

    words = np.array([[1, 0], [2, 0]], np.uint32)
    lengths = np.array([16, 16], np.int32)
    c = ShortSeqCounter()
    for _ in range(3):
        update_counter_from_host_table(
            c, words, lengths, np.array([1, 300], np.int64))
    assert sorted(c.values()) == [3, 900], dict(c)


class TestRound3AdviceFixes:
    """Round-3 advisor findings (ADVICE.md r03)."""

    def test_topk_step_cache_is_bounded(self):
        from shortseq_tpu.dist import table as dt

        dt._TOPK_STEPS.clear()
        for i in range(3 * dt._TOPK_STEPS_MAX):
            dt._topk_step_put(("mesh", i), object())
        assert len(dt._TOPK_STEPS) <= dt._TOPK_STEPS_MAX
        # newest entries survive FIFO eviction
        assert ("mesh", 3 * dt._TOPK_STEPS_MAX - 1) in dt._TOPK_STEPS
        dt._TOPK_STEPS.clear()

    def test_setup_py_has_no_unconditional_march_native(self):
        """A wheel built with -march=native can SIGILL on an older CPU;
        setup.py must gate it behind SHORTSEQ_TPU_MARCH_NATIVE (the
        on-demand JIT build, which always compiles on the running host,
        keeps it unconditionally)."""
        import os

        import ast
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = open(os.path.join(root, "setup.py")).read()
        # every -march=native occurrence in CODE (not docstring) must sit
        # inside the env-gated append, never in a base flags list
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, ast.List):
                flags = [getattr(e, "value", None) for e in node.elts]
                assert "-march=native" not in flags, \
                    "unconditional -march=native in a flags list"
        assert 'os.environ.get("SHORTSEQ_TPU_MARCH_NATIVE")' in src
        jit = open(os.path.join(
            root, "shortseq_tpu", "native_build.py")).read()
        assert "-march=native" in jit

    def test_calibration_cache_keeps_concurrent_keys(self, tmp_path,
                                                     monkeypatch):
        """The locked read-modify-write must preserve other widths'
        entries (last-writer-wins dropped them before)."""
        from shortseq_tpu.ops import pallas_kernels as pk

        monkeypatch.setattr(pk, "_calib_file",
                            lambda: str(tmp_path / "calib.json"))
        monkeypatch.setattr(pk, "_CALIB_ROWS", 8)
        monkeypatch.setattr(pk, "_CALIB_COLS", 16)
        pk._CALIBRATION.clear()
        pk.calibrate_pairwise(2, force=True)
        pk.calibrate_pairwise(6, force=True)
        import json

        disk = json.load(open(tmp_path / "calib.json"))
        keys = set(disk)
        assert any(k.endswith("/w2") for k in keys)
        assert any(k.endswith("/w6") for k in keys)
        assert not list(tmp_path.glob("*.lock"))  # lock released
        pk._CALIBRATION.clear()
