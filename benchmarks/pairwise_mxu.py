"""MXU one-hot-dot pairwise hamming vs the tiled Pallas XOR kernel, on
the real chip, slope-timed (bench.py methodology: iterations inside one
fori_loop, slope between k_lo/k_hi dispatches, min over rounds).

Usage: python benchmarks/pairwise_mxu.py [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def sweep():
    import jax
    import jax.numpy as jnp

    from shortseq_tpu.ops import hamming_pairwise_mxu
    from shortseq_tpu.ops.pallas_kernels import hamming_pairwise_tiled

    rng = np.random.default_rng(1)
    out = {"backend": jax.devices()[0].platform}
    k_lo, k_hi, k0 = 8, 64, 4
    for name, fn in (("pallas", hamming_pairwise_tiled),
                     ("mxu", hamming_pairwise_mxu)):
        for w, n in ((2, 8192), (6, 8192), (64, 4096)):
            a = jnp.asarray(
                rng.integers(0, 2**32, size=(k0 * n, w), dtype=np.uint64)
                .astype(np.uint32))
            b = a[:n]

            @jax.jit
            def loop(a_all, b, k, n=n, fn=fn):
                def body(i, acc):
                    x = jax.lax.dynamic_slice_in_dim(a_all, (i % k0) * n,
                                                     n, 0)
                    return acc + jnp.sum(fn(x, b))
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            jax.device_get(loop(a, b, jnp.int32(k_hi)))
            t_lo = t_hi = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                jax.device_get(loop(a, b, jnp.int32(k_lo)))
                t1 = time.perf_counter()
                jax.device_get(loop(a, b, jnp.int32(k_hi)))
                t2 = time.perf_counter()
                t_lo = min(t_lo, t1 - t0)
                t_hi = min(t_hi, t2 - t1)
            dt = (t_hi - t_lo) / (k_hi - k_lo)
            out[f"{name}_w{w}_pairs_per_s"] = n * n / dt
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()
    result = sweep()
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
