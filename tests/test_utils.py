"""Utils: phase timers, debug dumps, config."""

import re

from shortseq_tpu.utils import phase_timer, printbin, dump_lanes
from shortseq_tpu.utils.profiling import PhaseTimings


class TestProfiling:
    def test_phase_timer_accumulates(self):
        t = PhaseTimings()
        with phase_timer("read", t):
            pass
        with phase_timer("read", t):
            pass
        with phase_timer("count", t):
            pass
        assert set(t.phases) == {"read", "count"}
        assert "read:" in t.report()

    def test_phase_timer_echo(self, capsys):
        with phase_timer("pack", echo=True):
            pass
        assert re.match(r"pack: \d+\.\d\ds", capsys.readouterr().out)


class TestDebug:
    def test_printbin_groups_lsb_first(self):
        # ACGT packs to codes 0,1,3,2 -> groups "00 01 11 10" LSB-first.
        from shortseq_tpu import oracle

        word = oracle.encode_bytes(b"ACGT")[0]
        s = printbin(word, bits=8)
        assert s == "00 01 11 10"

    def test_dump_lanes(self):
        import numpy as np

        out = dump_lanes(np.array([[5, 0]], dtype=np.uint32),
                         lengths=np.array([3]))
        assert out.startswith("row 0:") and "len=3" in out

    def test_dump_lanes_truncates(self):
        import numpy as np

        out = dump_lanes(np.zeros((20, 1), np.uint32), max_rows=2)
        assert "18 more rows" in out


class TestConfig:
    def test_defaults(self):
        from shortseq_tpu.config import DEFAULT_CONFIG

        assert DEFAULT_CONFIG.bucket_widths == (32, 96, 1024)
