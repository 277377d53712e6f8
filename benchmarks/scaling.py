"""Scaling-efficiency harness: reads/s of the sharded count pipeline at
1..N devices over a `data` mesh (BASELINE target: >=85% efficiency at 2+
hosts).

On a pod slice this runs on real chips (jax.distributed + one process per
host); on a dev box run it under a simulated CPU mesh to validate the
methodology and the collective-merge scaling shape:

    PYTHONPATH=. JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py

Prints one JSON line per device count: reads/s and efficiency vs the
single-device run scaled linearly.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _make_reads(n, width=32, seed=0, dup=4):
    rng = np.random.default_rng(seed)
    pool = np.frombuffer(b"ACTG", np.uint8)[
        rng.integers(0, 4, size=(n // dup, width))].astype(np.uint8)
    idx = rng.integers(0, n // dup, size=n)
    return pool[idx], np.full(n, width, np.int32)


def run(n_per_device=1 << 17, width=32, method="all_gather"):
    from shortseq_tpu.dist.count import (count_sharded_bucketed,
                                         make_sharded_counter)
    from shortseq_tpu.dist.mesh import data_mesh
    from shortseq_tpu.ops.bitpack import pack_words

    devices = jax.devices()
    results = []
    base = None
    for nd in [d for d in (1, 2, 4, 8, 16) if d <= len(devices)]:
        mesh = data_mesh(devices[:nd])
        n = n_per_device * nd
        mat, lengths = _make_reads(n, width)
        if method == "bucketed":
            step_b = count_sharded_bucketed(mesh)
            words = pack_words(jnp.asarray(mat))
            l = jnp.asarray(lengths)
            ones = jnp.ones(n, jnp.int32)
            step = lambda: step_b(words, l, ones)[2]
        else:
            step_g = make_sharded_counter(mesh)
            a, l = jnp.asarray(mat), jnp.asarray(lengths)
            step = lambda: step_g(a, l)[2]
        jax.block_until_ready(step())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(step())
            best = min(best, time.perf_counter() - t0)
        rps = n / best
        if base is None:
            base = rps
        eff = rps / (base * nd)
        results.append({"devices": nd, "method": method,
                        "reads_per_s": rps, "efficiency": eff})
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--method", default="all_gather",
                   choices=["all_gather", "bucketed"])
    args = p.parse_args()
    run(method=args.method)
