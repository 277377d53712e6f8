"""True multi-process validation of the multi-host dedup entry point.

VERDICT.md round-1 gap #2: `read_and_count_fastq_distributed`'s
multi-controller branch (dist/pipeline.py process_allgather +
make_array_from_process_local_data padding) had never executed.  Here two
`jax.distributed` CPU processes (gloo collectives, 2 virtual devices each)
run the entry point end-to-end on a temp FASTQ and the parent asserts the
replicated merged table is identical on both hosts and equal to
collections.Counter - the reference's dedup-parity oracle
(reference shortseq/tests/unit_tests_profiling.py:136).

The FASTQ mixes width classes and uneven record sizes so the per-host
tables differ in BOTH row count and lane width, exercising the
max-rows/max-width padding path before the collective merge.
"""

import collections
import json
import random
import socket
import subprocess
import sys

from tests.conftest import scrubbed_cpu_env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_fastq(path, rng):
    # A small pool of reads -> plenty of duplicates; lengths straddle the
    # 64/192 width-class edge so different shards yield different lane
    # widths.  Long headers/quality lines of varying size skew the byte
    # ranges, making per-host table sizes unequal.
    pool = (["".join(rng.choice("ACGT") for _ in range(rng.randint(8, 32)))
             for _ in range(12)]
            + ["".join(rng.choice("ACGT") for _ in range(rng.randint(33, 96)))
               for _ in range(5)])
    reads = [rng.choice(pool) for _ in range(400)]
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@read_{i}_{'x' * rng.randint(0, 40)}\n{r}\n+\n"
                    f"{'I' * len(r)}\n")
    return reads


import os

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _run_multihost(tmp_path, n_procs: int, devices_per_proc: int):
    rng = random.Random(0xD15C0 + n_procs)
    fastq = tmp_path / "reads.fastq"
    reads = _make_fastq(fastq, rng)
    expect = collections.Counter(reads)

    port = _free_port()
    outs = [tmp_path / f"table_{i}.json" for i in range(n_procs)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER,
             str(i), str(n_procs), str(port), str(fastq), str(outs[i])],
            env=scrubbed_cpu_env(devices_per_proc),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(n_procs)
    ]
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    for p, err in zip(procs, errs):
        assert p.returncode == 0, err[-4000:]

    results = [json.loads(o.read_text()) for o in outs]
    tables = [r["table"] for r in results]
    # Every host materializes the identical table (the scattered layout's
    # multi-controller fetch exchanges disjoint live rows host-to-host).
    for t in tables[1:]:
        assert t == tables[0]
    # Bit-exact dedup parity vs the reference oracle (full dict, not just
    # the count multiset).
    assert tables[0] == dict(expect)
    # count_sharded_auto's overflow branch agreed on EVERY controller:
    # skewed keys flipped all processes to the exact fallback, benign
    # keys kept all of them on the scattered fast path (the workers also
    # assert exact counts for both).
    assert [r["skew_layout"] for r in results] == ["prefix"] * n_procs
    assert [r["benign_layout"] for r in results] == ["scattered"] * n_procs


def test_two_process_distributed_count(tmp_path):
    _run_multihost(tmp_path, n_procs=2, devices_per_proc=2)


def test_three_process_nonpow2_mesh(tmp_path):
    """3 processes x 1 device: a non-power-of-two GLOBAL mesh driving the
    production bucketed merge end-to-end across real process boundaries
    (gloo collectives) - combines the non-pow2 _bucket_hash fix with the
    multi-controller scattered-table fetch, plus the forced
    bucketed-overflow fallback with host-side branch agreement on all
    three controllers (VERDICT r03 next-step 8)."""
    _run_multihost(tmp_path, n_procs=3, devices_per_proc=1)
