"""Sanitizer job for the native host code (SURVEY.md section 5: the
device side is data-race-free by construction under XLA; the C++ sharder
is the one component with real threads, so it gets ASan/TSan coverage).

Each test builds csrc/fastq_index.cpp with a sanitizer into a standalone
binary exercising the multi-threaded index/gather/pack paths and asserts a
clean exit.  Skipped when the toolchain lacks sanitizer runtimes."""

import subprocess
import textwrap
from pathlib import Path

import pytest

CSRC = Path(__file__).resolve().parent.parent / "csrc" / "fastq_index.cpp"

HARNESS = textwrap.dedent("""
    #include <cstdint>
    #include <cstring>
    #include <string>
    #include <vector>
    extern "C" {
      int64_t ssq_count_lines(const char*, int64_t);
      int64_t ssq_fastq_index(const char*, int64_t, int64_t*, int32_t*, int64_t);
      void ssq_gather_padded(const char*, const int64_t*, const int32_t*,
                             int64_t, int64_t, uint8_t*);
      int64_t ssq_fastq_sync(const char*, int64_t, int64_t);
      int64_t ssq_pack_rows(const uint8_t*, const int32_t*, int64_t, int64_t,
                            uint32_t*);
      int64_t ssq_gather_pack(const char*, const int64_t*, const int32_t*,
                              int64_t, int64_t, uint32_t*);
      int64_t ssq_host_count(const uint32_t*, const int32_t*, int64_t,
                             int64_t, uint32_t*, int32_t*, int64_t*);
    }
    int main() {
      // 250k records (~9 MB) crosses the parallel-index threshold (8 MB)
      // so the sync-split multi-threaded indexer runs under the sanitizer.
      const int64_t N = 250000;
      std::string fq;
      fq.reserve(N * 40);
      for (int64_t i = 0; i < N; ++i)
        fq += "@r" + std::to_string(i) + "\\nACGTACGTACGTACGT\\n+\\n@IIIIIIIIIIIIIII\\n";
      int64_t n = (int64_t)fq.size();
      if (ssq_count_lines(fq.data(), n) != 4 * N) return 1;
      std::vector<int64_t> starts(N + 1);
      std::vector<int32_t> lengths(N + 1);
      int64_t reads = ssq_fastq_index(fq.data(), n, starts.data(),
                                      lengths.data(), N + 1);
      if (reads != N) return 2;
      std::vector<uint8_t> mat(reads * 16);
      ssq_gather_padded(fq.data(), starts.data(), lengths.data(), reads, 16,
                        mat.data());
      if (memcmp(mat.data(), "ACGTACGTACGTACGT", 16) != 0) return 3;
      std::vector<uint32_t> words(reads * 1);
      if (ssq_pack_rows(mat.data(), lengths.data(), reads, 16, words.data()))
        return 4;
      if (ssq_fastq_sync(fq.data(), n, 1) == 0) return 5;
      // Past-the-end offsets previously wrapped the memchr count to a
      // huge size_t (OOB read) - exactly what ASan is here to catch.
      if (ssq_fastq_sync(fq.data(), n, n) != n) return 10;
      if (ssq_fastq_sync(fq.data(), n, n + 1) != n) return 11;
      if (ssq_fastq_sync(fq.data(), n, (int64_t)1 << 60) != n) return 12;
      // Fused gather+pack must agree with the matrix route.
      std::vector<uint32_t> words2(reads * 1);
      if (ssq_gather_pack(fq.data(), starts.data(), lengths.data(), reads, 16,
                          words2.data()))
        return 6;
      if (memcmp(words.data(), words2.data(), reads * 4) != 0) return 7;
      // Threaded partitioned hash count: N identical keys -> 1 unique.
      std::vector<uint32_t> uw(reads * 1);
      std::vector<int32_t> ul(reads);
      std::vector<int64_t> uc(reads);
      int64_t uniq = ssq_host_count(words.data(), lengths.data(), reads, 1,
                                    uw.data(), ul.data(), uc.data());
      if (uniq != 1 || uc[0] != reads) return 8;
      // And all-unique rows stress the table-growth path.
      for (int64_t i = 0; i < reads; ++i) words[i] = (uint32_t)i;
      uniq = ssq_host_count(words.data(), lengths.data(), reads, 1,
                            uw.data(), ul.data(), uc.data());
      if (uniq != reads) return 9;
      return 0;
    }
""")


@pytest.mark.parametrize("flag", ["address", "thread"])
def test_native_sharder_under_sanitizer(flag, tmp_path):
    harness = tmp_path / "harness.cpp"
    harness.write_text(HARNESS)
    binary = tmp_path / f"harness_{flag}"
    build = subprocess.run(
        ["g++", "-O1", "-g", f"-fsanitize={flag}", "-std=c++17", "-pthread",
         str(CSRC), str(harness), "-o", str(binary)],
        capture_output=True, text=True, timeout=180)
    if build.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {build.stderr[-200:]}")
    run = subprocess.run([str(binary)], capture_output=True, text=True,
                         timeout=300)
    assert run.returncode == 0, (run.returncode, run.stderr[-3000:])
    assert "ERROR" not in run.stderr


def test_object_extension_under_asan(tmp_path):
    """The CPython object extension does manual refcounting and raw heap
    blocks (ShortSeqVar); stress pack/slice/subscript/xor/ingest under
    AddressSanitizer.  Leak detection stays off (CPython's arena behavior
    is not the subject); memory errors abort."""
    import sys
    import sysconfig
    import textwrap

    asan_rt = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True).stdout.strip()
    if not asan_rt or "/" not in asan_rt:
        pytest.skip("libasan unavailable")
    src = CSRC.parent / "shortseq_native.cpp"
    so = tmp_path / ("_native_asan"
                     + (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))
    inc = sysconfig.get_paths()["include"]
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address", "-std=c++17", "-shared",
         "-fPIC", f"-I{inc}", str(src), "-o", str(so)],
        capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        pytest.skip(f"asan build unavailable: {build.stderr[-200:]}")
    driver = textwrap.dedent(f"""
        import importlib.machinery, importlib.util, random
        loader = importlib.machinery.ExtensionFileLoader(
            'shortseq_tpu._native', {str(so)!r})
        spec = importlib.util.spec_from_loader('shortseq_tpu._native', loader)
        m = importlib.util.module_from_spec(spec); loader.exec_module(m)
        import numpy as np
        rng = random.Random(7)
        keep = []
        for trial in range(1500):
            n = rng.randint(0, 1024)
            s = ''.join(rng.choice('ACGT') for _ in range(n))
            o = m.pack(s)
            assert str(o) == s
            if n:
                a, b = sorted(rng.randint(0, n) for _ in range(2))
                assert str(o[a:b]) == s[a:b]
                _ = o[rng.randint(0, n - 1)]
                assert (o ^ o) == 0
                _ = hash(o); _ = repr(o)
            keep.append(o)
        try: m.from_blocks([1], 200); raise SystemExit('no raise')
        except ValueError: pass
        assert str(m.from_blocks([0xF], 1)) == 'G'
        d = {{}}
        m.count_bytes_list(d, [b'ACGT', b'ACGT', b'TTTT'] * 100)
        assert sum(d.values()) == 300 and len(d) == 2
        words = np.zeros((4, 2), np.uint32); words[:, 0] = [3, 7, 11, 15]
        lengths = np.array([4, 8, 12, 16], np.int32)
        m.update_from_table(d, words, lengths,
                            np.array([1, 2, 3, 4], np.int64))
        assert sum(d.values()) == 310
        try:
            m.update_from_table(d, words, np.array([40, 4, 4, 4], np.int32),
                                np.array([1, 1, 1, 1], np.int64))
            raise SystemExit('no capacity raise')
        except ValueError: pass
        assert len(m.seqs_from_rows(words, lengths)) == 4
        print('EXT-ASAN-OK')
    """)
    import os

    env = dict(os.environ, LD_PRELOAD=asan_rt,
               ASAN_OPTIONS="detect_leaks=0:abort_on_error=1",
               PYTHONMALLOC="malloc")
    run = subprocess.run([sys.executable, "-c", driver], capture_output=True,
                         text=True, timeout=600, env=env)
    assert run.returncode == 0, (run.returncode, run.stderr[-3000:])
    assert "EXT-ASAN-OK" in run.stdout
    assert "ERROR: AddressSanitizer" not in run.stderr
