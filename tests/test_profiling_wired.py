"""The profiling subsystem is WIRED into the hot paths (VERDICT r03
next-step 4, SURVEY section 5 tracing row): every production kernel runs
under a jax.named_scope, so XLA traces and xprof attribute time to
recognizable names, and the reference-style pipeline print flows through
phase_timer (api/counter.py) rather than raw time.time().

The scope names are asserted IN THE LOWERED HLO - metadata survives
jit+lowering, so a refactor that silently drops a scope fails here, not
in a profiling session weeks later.  docs/PROFILING.md documents the
trace() recipe and a committed trace summary from the real chip.
"""

import numpy as np
import pytest


def _lowered_text(jitted, *args, **kw):
    # debug_info=True keeps location metadata (the named_scope path) in
    # the StableHLO text; without it scopes are stripped from as_text().
    return jitted.lower(*args, **kw).as_text(debug_info=True)


class TestScopesInHLO:
    def test_pack_validate_scope(self):
        import jax.numpy as jnp

        from shortseq_tpu.ops.bitpack import pack_and_validate_folded

        x = jnp.zeros((8, 128), jnp.uint32)
        lens = jnp.zeros((8, 16), jnp.int32)
        txt = _lowered_text(pack_and_validate_folded, x, lens, 8)
        assert "ssq.pack_validate" in txt

    def test_pack_only_scope(self):
        import jax.numpy as jnp

        from shortseq_tpu.ops.bitpack import pack_folded

        x = jnp.zeros((8, 128), jnp.uint32)
        assert "ssq.pack" in _lowered_text(pack_folded, x, 8)

    def test_unpack_scope(self):
        import jax

        from shortseq_tpu.ops.bitpack import unpack_ascii

        x = np.zeros((4, 2), np.uint32)
        assert "ssq.unpack" in _lowered_text(jax.jit(unpack_ascii), x)

    def test_hamming_scopes(self):
        from shortseq_tpu.ops.hamming import (
            hamming_pairwise,
            hamming_pairwise_mxu,
            hamming_rows,
        )

        a = np.zeros((8, 2), np.uint32)
        assert "ssq.hamming_rows" in _lowered_text(hamming_rows, a, a)
        assert "ssq.pairwise_jnp" in _lowered_text(hamming_pairwise, a, a)
        assert "ssq.pairwise_mxu" in _lowered_text(hamming_pairwise_mxu,
                                                   a, a)

    def test_unique_count_scope(self):
        import jax
        import jax.numpy as jnp

        from shortseq_tpu.count.device import unique_count

        w = jnp.zeros((16, 2), jnp.uint32)
        ln = jnp.zeros((16,), jnp.int32)
        c = jnp.ones((16,), jnp.int32)
        assert "ssq.unique_count" in _lowered_text(jax.jit(unique_count),
                                                   w, ln, c)

    def test_distributed_merge_scopes_in_source(self):
        """The collective merges run only under a multi-device mesh (the
        8-device subprocess suite and the driver dryrun execute them);
        here pin that the scopes exist at the call sites so a refactor
        cannot silently drop them."""
        import inspect

        import shortseq_tpu.dist.count as dc

        src = inspect.getsource(dc)
        assert 'named_scope("ssq.merge_allgather")' in src
        assert 'named_scope("ssq.bucket_exchange")' in src


class TestPhaseTimerWired:
    def test_reference_style_print_via_phase_timer(self, tmp_path, capsys):
        from shortseq_tpu.api.counter import read_and_count_fastq

        path = tmp_path / "p.fastq"
        with open(path, "w") as f:
            for i in range(50):
                f.write(f"@r{i}\nACGTACGT\n+\nIIIIIIII\n")
        counts = read_and_count_fastq(path)
        out = capsys.readouterr().out
        # the reference's phase print shape (counter.pyx:70)
        assert "s to read 50 total seqs" in out
        assert "s to count 1 unique sequences" in out
        assert sum(counts.values()) == 50
