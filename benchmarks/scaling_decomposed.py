"""Defensible scaling evidence for the distributed count merges.

VERDICT.md round-2 weak #1: wall-clock on an oversubscribed 4-core host
running D virtual devices cannot support any conclusion about the >= 85%
reads/s weak-scaling target.  This harness replaces that with a
decomposition whose pieces are each measured where they are NOT
contended:

1. collective_bytes - the exact per-device collective payload of each
   strategy as f(D), extracted from the COMPILED HLO of the D-device
   program (all-gather / all-to-all op shapes; compiler-level ground
   truth, no timing involved).  Weak scaling: n_local rows per device.
2. device_kernel_time - the dominant per-device merge kernel
   (count.device.unique_count, a multi-operand sort) slope-timed on the
   real TPU chip at exactly the post-exchange sizes each strategy
   induces: the all_gather strategy re-sorts n_local*D rows per device,
   the bucketed strategy sorts its n_local shard plus a flat
   ~2*n_local-row receive buffer regardless of D.  One chip, no
   contention, dispatch latency cancelled by the slope.
3. cpu_mesh_walltime - the old weak-scaling walltime on the virtual CPU
   mesh, retained ONLY as a cross-check and labeled contended (D virtual
   devices share 4 cores).
4. model - per-device time(D) = kernel_time(strategy, D) +
   payload_bytes(strategy, D) / link_bandwidth, evaluated against
   pessimistic interconnect numbers (DCN-class 10 GB/s and ICI-class
   100 GB/s), giving the projected weak-scaling efficiency a real >= 2
   host pod would see for each strategy and why.

Usage:
  python benchmarks/scaling_decomposed.py --out SCALING_r04.json
  (subcommands --hlo D / --cpu-walltime D run in scrubbed CPU-mesh
  subprocesses; --kernel runs on the booted backend, i.e. the TPU)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_LOCAL = 1 << 20  # rows per device for kernel timing (a production batch)
N_LOCAL_HLO = 1024  # rows per device for HLO payload extraction (shape-only)
CAPACITY_FACTOR = 2.0

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8}


def _shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_bytes_from_hlo(txt: str, n_dev: int):
    """Per-device cross-device payload bytes of every collective in a
    compiled HLO module.  all-gather: the printed shape is the gathered
    per-device OUTPUT; (D-1)/D of it arrives over the interconnect.
    all-to-all: tuple of D slabs; (D-1) of them cross.  all-reduce /
    collective-permute: full output counted (upper bound; these are
    scalars here)."""
    ops = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"%?\S+ = (\(.*?\)|\S+) (all-gather|all-to-all|"
                     r"all-reduce|collective-permute)\(", line)
        if not m:
            continue
        shape, op = m.groups()
        if shape.startswith("("):
            parts = re.findall(r"\w+\[[\d,]*\]", shape)
            total = sum(_shape_bytes(p) for p in parts)
        else:
            total = _shape_bytes(shape)
        if op in ("all-gather", "all-to-all"):
            cross = total * (n_dev - 1) // n_dev
        else:
            cross = total
        ops.append({"op": op, "output_shape": shape[:120],
                    "output_bytes": total, "cross_device_bytes": cross})
    return ops


def run_hlo(n_dev: int):
    """Compile both strategies on an n_dev-device mesh and report their
    per-device collective payloads (weak scaling: n_local rows/device)."""
    import jax.numpy as jnp

    from shortseq_tpu.dist import (count_sharded, count_sharded_bucketed,
                                   data_mesh)

    mesh = data_mesh()
    n = N_LOCAL_HLO * n_dev
    words = jnp.zeros((n, 2), jnp.uint32)
    lengths = jnp.zeros(n, jnp.int32)
    ones = jnp.ones(n, jnp.int32)
    out = {"n_devices": n_dev, "n_local": N_LOCAL_HLO, "row_bytes": 16}
    for name, step in (
            ("gather", count_sharded(mesh)),
            ("bucketed_sharded",
             count_sharded_bucketed(mesh, CAPACITY_FACTOR, replicate=False))):
        txt = step.lower(words, lengths, ones).compile().as_text()
        ops = collective_bytes_from_hlo(txt, n_dev)
        out[name] = {
            "collectives": ops,
            "cross_device_bytes_per_device": sum(o["cross_device_bytes"]
                                                 for o in ops),
        }
    print(json.dumps(out))


def _slope_unique(n_rows: int, lanes: int = 2, rounds: int = 4,
                  k_lo: int = 2, k_hi: int = 10):
    """Fetch-forced slope time of one unique_count at [n_rows, lanes] -
    the dominant per-device merge kernel.  The loop perturbs the weights
    each pass (cheap, keys unchanged) so XLA cannot hoist the sort."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shortseq_tpu.count.device import unique_count

    rng = np.random.default_rng(7)
    words = jnp.asarray(rng.integers(0, 2**32, size=(n_rows, lanes),
                                     dtype=np.uint64).astype(np.uint32))
    lengths = jnp.asarray(rng.integers(max(16 * lanes - 17, 1) + 1,
                                       16 * lanes + 1, size=n_rows)
                          .astype(np.int32))

    @jax.jit
    def loop(words, lengths, k):
        def body(i, acc):
            w = jnp.ones(n_rows, jnp.int32) + (i % 2)
            _, _, counts, n_u = unique_count(words, lengths, w)
            return acc ^ n_u ^ counts[0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    lo, hi = jnp.int32(k_lo), jnp.int32(k_hi)
    jax.device_get(loop(words, lengths, hi))  # compile + warm
    t_lo = t_hi = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.device_get(loop(words, lengths, lo))
        t1 = time.perf_counter()
        jax.device_get(loop(words, lengths, hi))
        t_lo = min(t_lo, t1 - t0)
        t_hi = min(t_hi, time.perf_counter() - t1)
    return (t_hi - t_lo) / (k_hi - k_lo)


def run_kernel():
    """On the real chip: unique_count seconds at the per-device
    post-exchange sizes each strategy induces under weak scaling with
    N_LOCAL rows/device."""
    import jax

    out = {"backend": jax.devices()[0].platform,
           "device": getattr(jax.devices()[0], "device_kind", "?"),
           "n_local": N_LOCAL, "sizes": {}}
    # gather strategy sorts n_local * D rows per device at D devices;
    # bucketed sorts n_local (pre-exchange) + ~2*n_local (receive buffer).
    for mult in (1, 2, 4, 8, 16):
        out["sizes"][str(mult)] = _slope_unique(N_LOCAL * mult)
    # Per-width-class kernel rows (VERDICT r04 missing #1): unique_count
    # at the ladder's 2/6/64-lane buckets, measured on BOTH sort paths
    # (the lexicographic multi-operand sort and the hash-prefix sort) by
    # forcing count.device._LEX_SORT_MAX_LANES; the jit cache is cleared
    # around each forcing so the trace actually changes.
    from shortseq_tpu.count import device as D

    out["widths"] = {}
    auto_thresh = D._LEX_SORT_MAX_LANES
    for lanes, n_rows, k_hi in ((2, N_LOCAL, 10), (6, N_LOCAL, 10),
                                (64, N_LOCAL // 16, 4)):
        row = {"n_rows": n_rows,
               "auto_path": "lex" if lanes <= auto_thresh else "hash"}
        paths = [("hash", 0)]
        if lanes <= 6:
            paths.append(("lex", 9999))
        else:
            # The 65-operand forced-lex program is not measurable here:
            # its remote compile ran past a 7200 s budget and was killed
            # (twice; docs/ENVIRONMENT.md item 9) - which is the
            # strongest version of the result this row exists to show.
            row["lex_note"] = ("forced-lex compile exceeded 7200 s "
                               "through the remote compile service "
                               "(killed); per-row cost unmeasurable")
        for path, thresh in paths:
            D._LEX_SORT_MAX_LANES = thresh
            D.unique_count.clear_cache()
            try:
                dt = _slope_unique(n_rows, lanes=lanes, k_lo=1, k_hi=k_hi)
            finally:
                D._LEX_SORT_MAX_LANES = auto_thresh
                D.unique_count.clear_cache()
            row[f"{path}_s"] = dt
            row[f"{path}_rows_per_s"] = n_rows / dt
        out["widths"][str(lanes)] = row
    print(json.dumps(out))


def run_cpu_walltime(n_dev: int):
    """Contended cross-check: weak-scaling walltime on the virtual CPU
    mesh (n_dev virtual devices share this host's 4 cores)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shortseq_tpu.dist import (count_sharded, count_sharded_bucketed,
                                   data_mesh)

    mesh = data_mesh()
    n_local = 1 << 15
    n = n_local * n_dev
    rng = np.random.default_rng(3)
    words = jnp.asarray(rng.integers(0, 2**32, size=(n, 2), dtype=np.uint64)
                        .astype(np.uint32))
    lengths = jnp.asarray(rng.integers(15, 33, size=n).astype(np.int32))
    ones = jnp.ones(n, jnp.int32)
    out = {"n_devices": n_dev, "n_local": n_local, "contended": True}
    for name, step in (
            ("gather", count_sharded(mesh)),
            ("bucketed_sharded",
             count_sharded_bucketed(mesh, CAPACITY_FACTOR, replicate=False))):
        res = step(words, lengths, ones)
        jax.device_get(res[3])  # compile + fetch-forced warm
        best = float("inf")
        for _ in range(5):
            # The timed region covers exactly one step: dispatch plus the
            # fetch-forced sync of ITS n_unique scalar (syncing the prior
            # iteration inside the timer would bill its ~29 ms d2h round
            # trip to this one).
            t0 = time.perf_counter()
            res = step(words, lengths, ones)
            n_u = int(jax.device_get(res[3]))
            best = min(best, time.perf_counter() - t0)
        out[name] = {"wall_s": best, "n_unique": n_u}

    # Adapter-dimer skew (VERDICT r04 next-step 6): 75% of rows are ONE
    # key, the scenario that overflows the raw bucketed exchange every
    # batch at D >= 4.  Cost of the two recovery strategies: the
    # pre-dedup exchange (count_sharded_auto's tier 2 - local collapse,
    # then the same all_to_all) vs the all_gather re-sort (tier 3).
    skew_words = np.asarray(words).copy()
    skew_words[n // 4:] = skew_words[0]
    s_words = jnp.asarray(skew_words)
    out["skew_75pct_one_key"] = {}
    for name, step in (
            ("pre_dedup_exchange",
             count_sharded_bucketed(mesh, CAPACITY_FACTOR, replicate=False,
                                    pre_dedup=True)),
            ("gather", count_sharded(mesh))):
        res = step(s_words, lengths, ones)
        jax.device_get(res[3])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            res = step(s_words, lengths, ones)
            n_u = int(jax.device_get(res[3]))
            best = min(best, time.perf_counter() - t0)
        entry = {"wall_s": best, "n_unique": n_u}
        if name == "pre_dedup_exchange":
            entry["overflowed"] = bool(jax.device_get(res[4]))
        out["skew_75pct_one_key"][name] = entry
    print(json.dumps(out))


def _sub(args_list, n_dev):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run([sys.executable, __file__] + args_list,
                          env=env, capture_output=True, text=True,
                          timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _model(kernel, hlo_by_d, bandwidths=(10e9, 100e9)):
    """Projected per-device step time and weak-scaling efficiency.

    Per-device time(D) = merge kernel seconds + collective payload /
    bandwidth.  gather kernel grows with D (sorts n_local*D rows);
    bucketed kernel is flat (sorts n_local + ~2*n_local regardless of D,
    bounded above by the measured 4*n_local sort since sort cost is
    superlinear).  Payload is scaled from the HLO extraction's
    n_local=1024 shapes to the kernel measurement's N_LOCAL rows
    (payload is proportional to rows per device in both strategies)."""
    t = {m: kernel["sizes"][m] for m in kernel["sizes"]}
    scale = N_LOCAL / N_LOCAL_HLO
    out = {}
    for bw in bandwidths:
        strat = {}
        for name in ("gather", "bucketed_sharded"):
            eff = {}
            per_dev = {}
            for d_str, hlo in hlo_by_d.items():
                d = int(d_str)
                payload = hlo[name]["cross_device_bytes_per_device"] * scale
                if name == "gather":
                    kern = t.get(str(d))
                else:
                    # local pre-exchange sort (n_local) + receive-buffer
                    # sort (~2*n_local, flat in D); bounded by t(1)+t(2)
                    kern = t["1"] + t["2"]
                if kern is None:
                    continue
                total = kern + payload / bw
                per_dev[d_str] = total
            base = per_dev.get("2") or next(iter(per_dev.values()))
            # weak-scaling efficiency vs the 2-device point (the >= 2
            # hosts target is a ratio between multi-host sizes)
            for d_str, v in per_dev.items():
                eff[d_str] = base / v
            strat[name] = {"per_device_s": per_dev, "efficiency_vs_d2": eff}
        out[f"bw_{bw:.0e}"] = strat
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", type=int, default=None)
    ap.add_argument("--cpu-walltime", type=int, default=None)
    ap.add_argument("--kernel", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.hlo:
        return run_hlo(args.hlo)
    if args.cpu_walltime:
        return run_cpu_walltime(args.cpu_walltime)
    if args.kernel:
        return run_kernel()

    result = {"metric": "scaling_decomposition",
              "methodology": __doc__.split("Usage:")[0].strip()}
    hlo_by_d = {}
    for d in (2, 4, 8):
        hlo_by_d[str(d)] = _sub(["--hlo", str(d)], d)
    result["collective_bytes"] = hlo_by_d
    # Keep the existing PYTHONPATH (the TPU plugin registers through a
    # sitecustomize hook on it) and append the repo root.
    repo = str(Path(__file__).resolve().parent.parent)
    old_pp = os.environ.get("PYTHONPATH", "")
    kproc = subprocess.run(
        [sys.executable, __file__, "--kernel"],
        env={**os.environ,
             "PYTHONPATH": f"{old_pp}:{repo}" if old_pp else repo},
        # Generous: the forced-LEX width rows pay minutes-to-tens-of-
        # minutes of remote compile on first run (docs/ENVIRONMENT.md
        # item 9), and a killed compile caches nothing.
        capture_output=True, text=True, timeout=7200)
    if kproc.returncode != 0:
        raise RuntimeError(kproc.stderr[-2000:])
    kernel = json.loads(kproc.stdout.strip().splitlines()[-1])
    result["device_kernel_time"] = kernel
    result["cpu_mesh_walltime"] = {
        str(d): _sub(["--cpu-walltime", str(d)], d) for d in (1, 2, 4)}
    result["model"] = _model(kernel, hlo_by_d)
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
