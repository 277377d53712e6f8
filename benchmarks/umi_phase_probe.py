"""Phase breakdown of dedup_umis at scale: where does the wall time go
after the single-dispatch adjacency rewrite?  Times each stage of the
dedup_umis pipeline separately on the same inputs.

Usage: python benchmarks/umi_phase_probe.py [--u 100000]
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _rand_umis(u, length, seed=0):
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    mat = alphabet[rng.integers(0, 4, size=(u, length))]
    return [mat[i].tobytes() for i in range(u)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--u", type=int, default=100_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from shortseq_tpu.umi import dedup as D

    uniq = _rand_umis(args.u, 12)
    umis = uniq * 3
    t = {}

    t0 = time.perf_counter()
    norm = [u if isinstance(u, bytes) else bytes(u) for u in umis]
    counter = collections.Counter(norm)
    uniq_l = list(counter)
    index = {u: i for i, u in enumerate(uniq_l)}
    inverse = np.fromiter((index[u] for u in norm), np.int64, len(norm))
    counts = np.fromiter((counter[u] for u in uniq_l), np.int64, len(uniq_l))
    t["host_counter_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    words, lengths = D._pack_validate_umis(uniq_l)
    t["pack_validate_s"] = time.perf_counter() - t0

    # Warm-up adjacency (compile) then timed.
    words_np = np.asarray(words)
    t0 = time.perf_counter()
    nbrs = D._neighbor_lists(words_np, lengths, 1)
    t["neighbor_lists_warm1_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    nbrs = D._neighbor_lists(words_np, lengths, 1)
    t["neighbor_lists_warm2_s"] = time.perf_counter() - t0

    # Split neighbor_lists internals: device program vs host loop.
    import jax.numpy as jnp
    u = len(lengths)
    block = max(256, min(u, D._PAIR_BUDGET // max(u, 1)))
    block = -(-block // 128) * 128  # mirror _neighbor_lists
    k = min(D._NEIGHBOR_K, u)
    u_pad = -(-u // block) * block
    wp = np.pad(words_np, ((0, u_pad - u), (0, 0))) if u_pad != u else words_np
    lp = np.full(u_pad, -1, np.int32)
    lp[:u] = lengths
    gp = np.zeros(u_pad, np.int32)
    t0 = time.perf_counter()
    wd, ld, gd = jnp.asarray(wp), jnp.asarray(lp), jnp.asarray(gp)
    jax.block_until_ready((wd, ld, gd))
    t["h2d_s"] = time.perf_counter() - t0
    step = D._neighbor_step()
    t0 = time.perf_counter()
    out = step(wd, ld, gd, threshold=1, k=k, block=block)
    jax.block_until_ready(out)
    t["device_program_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx, cnt = jax.device_get(out)
    t["d2h_fetch_s"] = time.perf_counter() - t0
    t["fetch_bytes"] = idx.nbytes + cnt.nbytes
    valid = idx < u_pad
    t0 = time.perf_counter()
    neighbors = [None] * u
    for r in range(u):
        neighbors[r] = idx[r][valid[r]].copy()
    t["host_nbr_loop_s"] = time.perf_counter() - t0
    t["total_edges"] = int(cnt[:u].sum())
    t["max_row_cnt"] = int(cnt[:u].max())

    t0 = time.perf_counter()
    roots = D._collapse(nbrs, counts, "directional")
    t["collapse_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels_u, rep_nodes = D._relabel(roots, counts)
    t["relabel_s"] = time.perf_counter() - t0

    # End-to-end wall for the same inputs (warm), so the phase sum can be
    # checked against what dedup_umis actually costs.
    from shortseq_tpu.umi import dedup_umis

    dedup_umis(umis, threshold=1, method="directional")  # warm
    t0 = time.perf_counter()
    dedup_umis(umis, threshold=1, method="directional")
    t["dedup_umis_warm_total_s"] = time.perf_counter() - t0

    line = json.dumps(t)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
