"""Failure injection: a worker dies mid-run (hard os._exit, no cleanup)
after spilling some shard checkpoints; a fresh process resumes from the
checkpoint directory and must produce exact counts while recounting only
the missing shards (SURVEY aux subsystem "failure detection / recovery";
round-1 VERDICT row 21 called the unit-level resume tests out as the only
coverage)."""

import collections
import json
import random
import subprocess
import sys

from tests.conftest import scrubbed_cpu_env

_CRASH_SCRIPT = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import shortseq_tpu.count.checkpoint as ckpt

real_save = ckpt.save_table
calls = {"n": 0}
def dying_save(*a, **k):
    real_save(*a, **k)
    calls["n"] += 1
    if calls["n"] >= int(sys.argv[3]):
        os._exit(17)  # hard crash: no atexit, no finally blocks
ckpt.save_table = dying_save
# The pipeline module binds save_table at call time via the module import,
# so patch the name it looks up.
import shortseq_tpu.dist.pipeline as pl

from shortseq_tpu.config import PipelineConfig
cfg = PipelineConfig(checkpoint_dir=sys.argv[2])
pl.count_fastq_sharded(sys.argv[1], n_shards=4, config=cfg)
print("UNEXPECTED: completed without crashing")
sys.exit(1)
"""

_RESUME_SCRIPT = r"""
import sys, json
sys.path.insert(0, "/root/repo")
import shortseq_tpu.count.checkpoint as ckpt

recounted = []
real_save = ckpt.save_table
def counting_save(path, *a, **k):
    recounted.append(str(path))
    real_save(path, *a, **k)
ckpt.save_table = counting_save

from shortseq_tpu.config import PipelineConfig
from shortseq_tpu.dist.pipeline import count_fastq_sharded, table_to_counter
cfg = PipelineConfig(checkpoint_dir=sys.argv[2])
counts = table_to_counter(count_fastq_sharded(sys.argv[1], n_shards=4, config=cfg))
print(json.dumps({"counts": {str(k): v for k, v in counts.items()},
                  "recounted": len(recounted)}))
"""


def test_mid_run_crash_then_resume(tmp_path):
    rng = random.Random(0xDEAD)
    pool = ["".join(rng.choice("ACGT") for _ in range(rng.randint(8, 30)))
            for _ in range(10)]
    reads = [rng.choice(pool) for _ in range(240)]
    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    ckpt_dir = tmp_path / "ckpt"

    env = scrubbed_cpu_env()
    # Crash after 2 of 4 shard checkpoints have been spilled.
    crash = subprocess.run(
        [sys.executable, "-c", _CRASH_SCRIPT, str(fq), str(ckpt_dir), "2"],
        env=env, capture_output=True, text=True, timeout=300)
    assert crash.returncode == 17, (crash.returncode, crash.stderr[-2000:])
    spilled = list(ckpt_dir.glob("counts_*.npz"))
    assert len(spilled) == 2, spilled

    resume = subprocess.run(
        [sys.executable, "-c", _RESUME_SCRIPT, str(fq), str(ckpt_dir)],
        env=env, capture_output=True, text=True, timeout=300)
    assert resume.returncode == 0, resume.stderr[-2000:]
    out = json.loads(resume.stdout.strip().splitlines()[-1])
    # Only the 2 missing shards were recounted, and the table is exact.
    assert out["recounted"] == 2
    assert out["counts"] == dict(collections.Counter(reads))
