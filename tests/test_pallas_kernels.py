"""Tiled Pallas pairwise-hamming kernel vs the jnp broadcast op and the
string oracle.  The Mosaic lowering only exists on TPU; off-TPU these
tests exercise the auto-fallback path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _rand_words(n, w, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2**32, size=(n, w), dtype=np.uint64).astype(np.uint32))


on_tpu = jax.devices()[0].platform == "tpu"


class TestPairwiseTiled:
    @pytest.mark.skipif(not on_tpu, reason="Mosaic kernel needs TPU")
    @pytest.mark.parametrize("n,m,w", [(128, 128, 2), (256, 384, 6),
                                       (130, 70, 4), (64, 64, 64)])
    def test_matches_jnp(self, n, m, w):
        from shortseq_tpu.ops import hamming_pairwise, hamming_pairwise_tiled

        a, b = _rand_words(n, w, 1), _rand_words(m, w, 2)
        got = np.asarray(hamming_pairwise_tiled(a, b))
        want = np.asarray(hamming_pairwise(a, b))
        assert (got == want).all()

    @pytest.mark.skipif(not on_tpu, reason="Mosaic kernel needs TPU")
    @pytest.mark.parametrize("tile", [128, 256])
    def test_explicit_tiles_agree(self, tile):
        from shortseq_tpu.ops import hamming_pairwise, hamming_pairwise_tiled

        a, b = _rand_words(300, 6, 3), _rand_words(500, 6, 4)
        got = np.asarray(hamming_pairwise_tiled(a, b, tile=tile))
        want = np.asarray(hamming_pairwise(a, b))
        assert (got == want).all()

    @pytest.mark.parametrize("n,m,w", [(128, 128, 2), (130, 70, 4),
                                       (64, 64, 6)])
    def test_interpret_matches_jnp(self, n, m, w):
        # The Pallas interpreter runs on any backend, so CI off-TPU still
        # executes the real kernel (tiling, index maps, popcount loop)
        # instead of only the jnp fallback.
        from shortseq_tpu.ops import hamming_pairwise, hamming_pairwise_tiled

        a, b = _rand_words(n, w, 1), _rand_words(m, w, 2)
        got = np.asarray(hamming_pairwise_tiled(a, b, interpret=True))
        want = np.asarray(hamming_pairwise(a, b))
        assert (got == want).all()

    @pytest.mark.parametrize("tile", [128, 256])
    def test_interpret_explicit_tiles(self, tile):
        from shortseq_tpu.ops import hamming_pairwise, hamming_pairwise_tiled

        a, b = _rand_words(300, 6, 3), _rand_words(300, 6, 4)
        got = np.asarray(hamming_pairwise_tiled(a, b, tile=tile,
                                                interpret=True))
        want = np.asarray(hamming_pairwise(a, b))
        assert (got == want).all()

    def test_auto_records_path(self):
        import jax

        from shortseq_tpu.ops import pallas_kernels as pk

        a = _rand_words(16, 2, 9)
        np.asarray(pk.pairwise_hamming_auto(a, a))
        # The auto path follows the per-(platform, device, width)
        # calibration, so the recorded path must equal the cached winner.
        platform = jax.devices()[0].platform
        kind = getattr(jax.devices()[0], "device_kind", platform)
        winner = pk._CALIBRATION[f"{platform}/{kind}/w2"]
        assert pk.LAST_PAIRWISE_PATH == winner
        assert winner in ("pallas", "mxu", "jnp")
        if platform != "tpu":
            assert winner != "pallas"  # never a candidate off-TPU

    def test_calibration_measures_and_caches(self, tmp_path, monkeypatch):
        """calibrate_pairwise: winner == argmin of the measured times;
        the decision persists to disk and reloads without re-measuring."""
        import jax

        from shortseq_tpu.ops import pallas_kernels as pk

        calib_file = str(tmp_path / "calib.json")
        monkeypatch.setattr(pk, "_calib_file", lambda: calib_file)
        monkeypatch.setattr(pk, "_CALIBRATION", {})
        times = pk.calibrate_pairwise(6, force=True)
        assert times and set(times) <= {"pallas", "mxu", "jnp"}
        platform = jax.devices()[0].platform
        kind = getattr(jax.devices()[0], "device_kind", platform)
        key = f"{platform}/{kind}/w6"
        assert pk._CALIBRATION[key] == min(times, key=times.get)
        # Fresh in-memory state: the disk cache must answer without
        # re-measuring (calibrate returns the persisted times).
        monkeypatch.setattr(pk, "_CALIBRATION", {})
        reloaded = pk.calibrate_pairwise(6)
        assert reloaded == times
        assert pk._CALIBRATION[key] == min(times, key=times.get)

    def test_auto_matches_oracle(self, rng):
        from tests.conftest import rand_sequence

        from shortseq_tpu.ops import pairwise_hamming_auto
        from shortseq_tpu.ops.bitpack import pack_words

        seqs = [rand_sequence(rng, 32) for _ in range(40)]
        mat = np.zeros((len(seqs), 32), np.uint8)
        for i, s in enumerate(seqs):
            mat[i] = np.frombuffer(s.encode(), np.uint8)
        words = pack_words(jnp.asarray(mat))
        dist = np.asarray(pairwise_hamming_auto(words, words))
        for i in range(0, len(seqs), 7):
            for j in range(0, len(seqs), 5):
                want = sum(a != b for a, b in zip(seqs[i], seqs[j]))
                assert dist[i, j] == want


def test_pairwise_env_override(monkeypatch):
    # SHORTSEQ_TPU_PAIRWISE selects the formulation; all are bit-exact.
    import numpy as np

    from shortseq_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(2)
    a = rng.integers(0, 2**32, size=(64, 2), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, size=(48, 2), dtype=np.uint64).astype(np.uint32)
    base = np.asarray(pk.pairwise_hamming_auto(a, b))
    monkeypatch.setenv("SHORTSEQ_TPU_PAIRWISE", "mxu")
    got = np.asarray(pk.pairwise_hamming_auto(a, b))
    assert pk.LAST_PAIRWISE_PATH == "mxu"
    assert (got == base).all()
    monkeypatch.setenv("SHORTSEQ_TPU_PAIRWISE", "jnp")
    got = np.asarray(pk.pairwise_hamming_auto(a, b))
    assert pk.LAST_PAIRWISE_PATH == "jnp"
    assert (got == base).all()
