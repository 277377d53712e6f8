"""Head-to-head microbenchmark of 2-bit pack formulations on the real chip.

Run:  python benchmarks/pack_variants.py [--n 1048576] [--width 160] [--k 16]

Methodology matches bench.py (docs/ENVIRONMENT.md): k disjoint slices of a
resident buffer packed inside one fori_loop dispatch, results folded into a
loop-carried scalar, best-of-rounds.  Also prints a raw read-reduce roofline
for the same buffer.

Variants:
  v0_u8        current ops.bitpack path: u8 input, two bitcast relayouts
  v1_u32_cast  u32 input (free host view), single u32->u8->u32 relayout at
               the end (quarter the data of v0's first relayout)
  v2_strided   u32 input, stride-4 lane slices + shift-or (no 8-bit types)
  v3_dot       u32 input, 4:1 lane compaction as two bf16 MXU dots with
               banded {1,256} weights; exact because every product is a
               (<=8-bit integer) * (power of two) and accumulation is f32
  v3b_dot1     like v3 but one [W4, 2W] dot + lane-slice combine
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from shortseq_tpu.ops.bitpack import pack_words as v0_pack  # u8 path


# ---------------------------------------------------------------- variants

def _codes_byte_u32(x):
    """u32 lane of 4 ascii -> u32 lane with one byte of 4 2-bit codes."""
    c = (x >> 1) & jnp.uint32(0x03030303)
    return (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)


def v1_u32_cast(x_u32):
    b = _codes_byte_u32(x_u32)                     # [N, W4]
    b8 = b.astype(jnp.uint8)
    n, w4 = b8.shape
    return jax.lax.bitcast_convert_type(
        b8.reshape(n, w4 // 4, 4), jnp.uint32)     # [N, W]


def v2_strided(x_u32):
    b = _codes_byte_u32(x_u32)
    return (b[:, 0::4] | (b[:, 1::4] << 8)
            | (b[:, 2::4] << 16) | (b[:, 3::4] << 24))


def _dot_mats(w4):
    w = w4 // 4
    p_lo = np.zeros((w4, w), np.float32)
    p_hi = np.zeros((w4, w), np.float32)
    for j in range(w):
        p_lo[4 * j + 0, j] = 1.0
        p_lo[4 * j + 1, j] = 256.0
        p_hi[4 * j + 2, j] = 1.0
        p_hi[4 * j + 3, j] = 256.0
    return p_lo, p_hi


def make_v3(w4):
    p_lo, p_hi = _dot_mats(w4)
    p_lo = jnp.asarray(p_lo, jnp.bfloat16)
    p_hi = jnp.asarray(p_hi, jnp.bfloat16)

    def v3_dot(x_u32):
        b = _codes_byte_u32(x_u32).astype(jnp.bfloat16)   # exact: 0..255
        lo = jax.lax.dot_general(b, p_lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        hi = jax.lax.dot_general(b, p_hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)

    return v3_dot


def make_v3b(w4):
    p_lo, p_hi = _dot_mats(w4)
    p = jnp.asarray(np.concatenate([p_lo, p_hi], axis=1), jnp.bfloat16)
    w = w4 // 4

    def v3b_dot1(x_u32):
        b = _codes_byte_u32(x_u32).astype(jnp.bfloat16)
        r = jax.lax.dot_general(b, p, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return r[:, :w].astype(jnp.uint32) | (r[:, w:].astype(jnp.uint32) << 16)

    return v3b_dot1


# ---------------------------------------------------------------- harness

def _make_batch(n, width, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(n, width)).astype(np.uint8)
    return np.frombuffer(b"ACTG", dtype=np.uint8)[codes].astype(np.uint8)


K_LO, K_HI = 8, 56


def _slope_time(loop, big, rounds=6):
    """Per-iteration seconds via the slope between K_LO and K_HI iteration
    dispatches: fixed costs (the ~29 ms tunnel dispatch latency, loop
    setup) cancel, leaving pure per-pass compute.  min-per-k over
    interleaved rounds, then slope of the mins - robust to one-off stalls
    that corrupt a single-difference estimate."""
    k_lo = jnp.int32(K_LO)
    k_hi = jnp.int32(K_HI)
    jax.block_until_ready(loop(big, k_hi))  # compile + warm
    t_lo = t_hi = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(big, k_lo))
        t1 = time.perf_counter()
        jax.block_until_ready(loop(big, k_hi))
        t2 = time.perf_counter()
        t_lo = min(t_lo, t1 - t0)
        t_hi = min(t_hi, t2 - t1)
    return (t_hi - t_lo) / (K_HI - K_LO)


def _make_loop(fn, n, k0):
    @jax.jit
    def loop(all_x, k):
        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(all_x, (i % k0) * n, n, 0)
            return acc + jnp.sum(fn(x), dtype=jnp.uint32)
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
    return loop


def bench_variant(fn, big, n, k0, width):
    dt = _slope_time(_make_loop(fn, n, k0), big)
    return n * width / dt


def bench_raw(big_u32, n4, k0):
    """Roofline: read-reduce the same uint32 buffer."""
    dt = _slope_time(_make_loop(lambda x: x, n4, k0), big_u32)
    return n4 * big_u32.shape[1] * 4 / dt          # bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    n, width, k = args.n, args.width, args.k
    w4 = width // 4

    mat = _make_batch(k * n, width)
    mat_u32 = np.ascontiguousarray(mat).view(np.uint32)

    from shortseq_tpu.utils.warmup import start_transfer_warmup
    start_transfer_warmup()

    big_u8 = jnp.asarray(mat)
    big_u32 = jnp.asarray(mat_u32)

    # correctness first
    ref = np.asarray(v0_pack(big_u8[:256]))
    variants = {
        "v1_u32_cast": v1_u32_cast,
        "v2_strided": v2_strided,
        "v3_dot": make_v3(w4),
        "v3b_dot1": make_v3b(w4),
    }
    for name, fn in list(variants.items()):
        try:
            got = np.asarray(jax.jit(fn)(big_u32[:256]))
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            assert (got == ref).all(), name
            print(f"{name}: correct")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            del variants[name]

    print(f"raw read-reduce: {bench_raw(big_u32, n, k) / 1e9:.1f} GB/s")
    r = bench_variant(v0_pack, big_u8, n, k, width)
    print(f"v0_u8: {r / 1e9:.1f} G nt/s")
    for name, fn in variants.items():
        r = bench_variant(fn, big_u32, n, k, width)
        print(f"{name}: {r / 1e9:.1f} G nt/s")

    # Fused pack + bloom validate (the production hot path).
    from shortseq_tpu.ops.bitpack import (pack_and_validate_u32,
                                          pack_words_u32, validate_u32)

    lengths = jnp.full((n,), width, jnp.int32)

    def swar_validate(x, lens):
        """Bloom validity via SWAR byte-equality - no per-byte variable
        shifts, so XLA can fuse it into the same input read as the pack."""
        m = x & jnp.uint32(0x3F3F3F3F)

        def eqz(y):  # exact per-byte zero test, bit7 flags
            return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                     | y) & jnp.uint32(0x80808080)

        ok_b = (eqz(m ^ jnp.uint32(0x01010101))
                | eqz(m ^ jnp.uint32(0x03030303))
                | eqz(m ^ jnp.uint32(0x07070707))
                | eqz(m ^ jnp.uint32(0x14141414)))
        nn, w4 = x.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (nn, w4), 1)
        rem = jnp.clip(lens[:, None] - 4 * lane, 0, 4)
        mask = jnp.where(
            rem >= 4, jnp.uint32(0x80808080),
            jnp.where(rem == 3, jnp.uint32(0x00808080),
                      jnp.where(rem == 2, jnp.uint32(0x00008080),
                                jnp.where(rem == 1, jnp.uint32(0x00000080),
                                          jnp.uint32(0)))))
        bad = (~ok_b) & mask
        return ~jnp.any(bad != 0, axis=1)

    def fused(x):
        w, ok = pack_and_validate_u32(x, lengths)
        return jnp.sum(w, dtype=jnp.uint32) + jnp.sum(ok).astype(jnp.uint32)

    def fused_swar(x):
        w = pack_words_u32(x)
        ok = swar_validate(x, lengths)
        return jnp.sum(w, dtype=jnp.uint32) + jnp.sum(ok).astype(jnp.uint32)

    def val_only(x):
        return jnp.sum(validate_u32(x, lengths)).astype(jnp.uint32)

    def val_swar_only(x):
        return jnp.sum(swar_validate(x, lengths)).astype(jnp.uint32)

    # correctness of the SWAR validate vs the reference path, incl. alias
    # bytes and tail masking
    probe = np.zeros((256, width), np.uint8)
    probe[:, 0] = ord("A")
    probe[:, 1] = np.arange(256)
    probe[:, 2:8] = ord("G")
    plen = np.full(256, 8, np.int32)
    pm = jnp.asarray(probe.view(np.uint32))
    pl_ = jnp.asarray(plen)
    got = np.asarray(jax.jit(swar_validate)(pm, pl_))
    ref2 = np.asarray(validate_u32(pm, pl_))
    assert (got == ref2).all(), np.flatnonzero(got != ref2)
    print("swar_validate: correct")

    for name, fn in (("pack_words_u32 (prod)", pack_words_u32),
                     ("validate_u32 only", val_only),
                     ("swar validate only", val_swar_only),
                     ("pack_and_validate_u32 fused", fused),
                     ("pack + swar validate fused", fused_swar)):
        r = bench_variant(fn, big_u32, n, k, width)
        print(f"{name}: {r / 1e9:.1f} G nt/s")


if __name__ == "__main__":
    main()
