"""Experiment: fold batch rows into the lane dimension of the dot-based
pack, so narrow per-width operands fill the TPU's 128-lane tiles.

A [N, w4] uint32 operand with w4 < 128 occupies (8, 128)-tiled memory with
the lane dim padded to 128, so every pass moves up to 16x the logical
bytes (w4 = 8 for the 32-nt bucket).  Folding F rows into one
([N/F, F*w4], host-side reshape = free) fills the lanes; the compaction
matrices become block-diagonal (still one dot).  Validation stays fused by
turning its two cross-lane steps into dots as well:

  * per-lane lengths: lengths_f [N/F, F] @ spread [F, F*w4] (constant 0/1);
  * per-row bad-byte count: badbits [N/F, F*w4] @ collect [F*w4, F].

Measured (v5e via tunnel, slope methodology per docs/PERF.md, width 160):
pack-only fold4 882 G nt/s vs 294 unfolded; raw stream 1105 GB/s.  This
script sweeps the production bucket widths and picks per-width folds.

Usage: python benchmarks/pack_fold.py [width:fold ...]
       default: 32:16 32:32 96:8 96:16 160:4 160:8 1024:1 1024:2
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

# Importing the package enables the persistent compile cache; the warmup
# overlaps the 60-300 s first-fetch handshake with host-side setup
# (docs/ENVIRONMENT.md).
from shortseq_tpu.utils.warmup import start_transfer_warmup

K_LO, K_HI = 8, 136


def slope_time(loop, args, rounds=6, k_lo=K_LO, k_hi=K_HI):
    k_span = k_hi - k_lo
    k_lo, k_hi = jnp.int32(k_lo), jnp.int32(k_hi)
    jax.block_until_ready(loop(*args, k_hi))
    t_lo = t_hi = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args, k_lo))
        t1 = time.perf_counter()
        jax.block_until_ready(loop(*args, k_hi))
        t2 = time.perf_counter()
        t_lo = min(t_lo, t1 - t0)
        t_hi = min(t_hi, t2 - t1)
    return (t_hi - t_lo) / k_span


def _codes_byte(x):
    c = (x >> 1) & jnp.uint32(0x03030303)
    return (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)


def _pack_mat(w4, fold):
    """[fold*w4, fold*w4/2] one-dot block-diagonal compaction matrix:
    columns [0, fw) produce the low 16 bits, [fw, 2fw) the high."""
    w = w4 // 4
    fw = fold * w
    p = np.zeros((fold * w4, 2 * fw), np.float32)
    for f in range(fold):
        for j in range(w):
            p[f * w4 + 4 * j + 0, f * w + j] = 1.0
            p[f * w4 + 4 * j + 1, f * w + j] = 256.0
            p[f * w4 + 4 * j + 2, fw + f * w + j] = 1.0
            p[f * w4 + 4 * j + 3, fw + f * w + j] = 256.0
    return p


def _len_spread_mat(w4, fold):
    """[F, F*w4] constant: broadcast per-logical-row lengths to lanes."""
    s = np.zeros((fold, fold * w4), np.float32)
    for f in range(fold):
        s[f, f * w4:(f + 1) * w4] = 1.0
    return s


def make_pack1(w4, fold):
    p = jnp.asarray(_pack_mat(w4, fold), jnp.bfloat16)
    fw = fold * (w4 // 4)
    dn = (((1,), (0,)), ((), ()))

    def pack1(x):
        b = _codes_byte(x).astype(jnp.bfloat16)
        r = jax.lax.dot_general(b, p, dn,
                                preferred_element_type=jnp.float32)
        return (r[:, :fw].astype(jnp.uint32)
                | (r[:, fw:].astype(jnp.uint32) << 16))
    return pack1


def make_fused_nzc(w4, fold):
    """Fused pack + validate with NO input-sized dot output.

    Semantics (zero-padding contract): a row is valid iff every byte is
    bloom-pass-or-zero AND the row's nonzero-byte count equals its length.
    Interior NULs shrink the nonzero count (reject, like the reference);
    nonzero garbage past the length grows it (reject — stricter than a
    length mask, and catches caller contract violations).  Both row
    reductions are dots with tiny [N/F, F] outputs; the measured cost of
    the previous formulation was its [N/F, F*w4] length-broadcast dot
    OUTPUT (dot operands fuse into the input read, dot outputs
    materialize to HBM).
    """
    pack1 = make_pack1(w4, fold)
    collect = jnp.asarray(_len_spread_mat(w4, fold).T, jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def eqz(y):
        return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                 | y) & jnp.uint32(0x80808080)

    def fused(x, lengths_f):
        words = pack1(x)
        m = x & jnp.uint32(0x3F3F3F3F)
        ok_b = (eqz(m ^ jnp.uint32(0x01010101))
                | eqz(m ^ jnp.uint32(0x03030303))
                | eqz(m ^ jnp.uint32(0x07070707))
                | eqz(m ^ jnp.uint32(0x14141414)))
        z = eqz(x)                                  # byte == 0 -> bit 7
        bad = ~(ok_b | z) & jnp.uint32(0x80808080)
        # Nonzero bytes per lane (0..4), shift-add horizontal sum (u32
        # multiplies are expensive on the VPU).
        a = (~z & jnp.uint32(0x80808080)) >> 7
        nz = (a + (a >> 8) + (a >> 16) + (a >> 24)) & jnp.uint32(0xFF)
        nzf = nz.astype(jnp.bfloat16)
        badf = (bad != 0).astype(jnp.bfloat16)
        nzrow = jax.lax.dot_general(nzf, collect, dn,
                                    preferred_element_type=jnp.float32)
        badrow = jax.lax.dot_general(badf, collect, dn,
                                     preferred_element_type=jnp.float32)
        ok = (badrow == 0.0) & (nzrow == lengths_f.astype(jnp.float32))
        return words, ok                            # ok [N/F, F]
    return fused


def make_val_mask(w4, fold):
    """Standalone folded validate, length-mask semantics: per-lane lengths
    via a constant f32 dot, tail mask, bad-lane collect dot."""
    spread = jnp.asarray(_len_spread_mat(w4, fold), jnp.float32)
    collect = jnp.asarray(_len_spread_mat(w4, fold).T, jnp.bfloat16)
    lane_in_row = jnp.asarray(
        np.tile(np.arange(w4, dtype=np.float32), fold), jnp.float32)
    dn = (((1,), (0,)), ((), ()))

    def eqz(y):
        return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                 | y) & jnp.uint32(0x80808080)

    def val(x, lengths_f):
        m = x & jnp.uint32(0x3F3F3F3F)
        ok_b = (eqz(m ^ jnp.uint32(0x01010101))
                | eqz(m ^ jnp.uint32(0x03030303))
                | eqz(m ^ jnp.uint32(0x07070707))
                | eqz(m ^ jnp.uint32(0x14141414)))
        len_lane = jax.lax.dot_general(
            lengths_f.astype(jnp.float32), spread, dn,
            preferred_element_type=jnp.float32)
        rem = jnp.clip(len_lane - 4.0 * lane_in_row[None, :], 0.0, 4.0) \
            .astype(jnp.int32)
        mask = jnp.where(
            rem >= 4, jnp.uint32(0x80808080),
            jnp.where(rem == 3, jnp.uint32(0x00808080),
                      jnp.where(rem == 2, jnp.uint32(0x00008080),
                                jnp.where(rem == 1, jnp.uint32(0x00000080),
                                          jnp.uint32(0)))))
        badf = (((~ok_b) & mask) != 0).astype(jnp.bfloat16)
        badrow = jax.lax.dot_general(badf, collect, dn,
                                     preferred_element_type=jnp.float32)
        return badrow == 0.0
    return val


def make_val_nzc(w4, fold):
    """Standalone folded validate, zero-padding-contract semantics."""
    fused = make_fused_nzc(w4, fold)

    def val(x, lengths_f):
        return fused(x, lengths_f)[1]
    return val


def make_val_nzc1(w4, fold):
    """Folded validate with ONE f32 dot: operand nz + 2048*bad per lane
    (exact in f32), row sum == length iff no bad byte and the nonzero
    count matches (a bad lane poisons the sum past any length <= 1024)."""
    collect = jnp.asarray(_len_spread_mat(w4, fold).T, jnp.float32)
    dn = (((1,), (0,)), ((), ()))

    def eqz(y):
        return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                 | y) & jnp.uint32(0x80808080)

    def val(x, lengths_f):
        m = x & jnp.uint32(0x3F3F3F3F)
        ok_b = (eqz(m ^ jnp.uint32(0x01010101))
                | eqz(m ^ jnp.uint32(0x03030303))
                | eqz(m ^ jnp.uint32(0x07070707))
                | eqz(m ^ jnp.uint32(0x14141414)))
        z = eqz(x)
        bad = ~(ok_b | z) & jnp.uint32(0x80808080)
        a = (~z & jnp.uint32(0x80808080)) >> 7
        nz = (a + (a >> 8) + (a >> 16) + (a >> 24)) & jnp.uint32(0xFF)
        v = (nz + (bad != 0).astype(jnp.uint32) * jnp.uint32(2048)) \
            .astype(jnp.float32)
        s = jax.lax.dot_general(v, collect, dn,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return s == lengths_f.astype(jnp.float32)
    return val


def make_fused_cat(w4, fold):
    """Fully fused pack + validate as ONE f32 dot over a lane-concat
    operand [codes | validity], so a single input read feeds both."""
    w = w4 // 4
    fw = fold * w
    L = fold * w4
    p = _pack_mat(w4, fold)
    coll = _len_spread_mat(w4, fold).T
    big = np.zeros((2 * L, 2 * fw + fold), np.float32)
    big[:L, :2 * fw] = p
    big[L:, 2 * fw:] = coll
    bigm = jnp.asarray(big, jnp.float32)
    dn = (((1,), (0,)), ((), ()))

    def eqz(y):
        return ~(((y & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F))
                 | y) & jnp.uint32(0x80808080)

    def fused(x, lengths_f):
        m = x & jnp.uint32(0x3F3F3F3F)
        ok_b = (eqz(m ^ jnp.uint32(0x01010101))
                | eqz(m ^ jnp.uint32(0x03030303))
                | eqz(m ^ jnp.uint32(0x07070707))
                | eqz(m ^ jnp.uint32(0x14141414)))
        z = eqz(x)
        bad = ~(ok_b | z) & jnp.uint32(0x80808080)
        a = (~z & jnp.uint32(0x80808080)) >> 7
        nz = (a + (a >> 8) + (a >> 16) + (a >> 24)) & jnp.uint32(0xFF)
        v = (nz + (bad != 0).astype(jnp.uint32) * jnp.uint32(2048)) \
            .astype(jnp.float32)
        op = jnp.concatenate([_codes_byte(x).astype(jnp.float32), v], axis=1)
        r = jax.lax.dot_general(op, bigm, dn,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        words = (r[:, :fw].astype(jnp.uint32)
                 | (r[:, fw:2 * fw].astype(jnp.uint32) << 16))
        ok = r[:, 2 * fw:] == lengths_f.astype(jnp.float32)
        return words, ok
    return fused


def make_loop(fn, n, k0):
    @jax.jit
    def loop(all_x, k):
        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(all_x, (i % k0) * n, n, 0)
            return acc ^ jnp.bitwise_xor.reduce(fn(x).ravel())
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
    return loop


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        print("usage: pack_fold.py [WIDTH:FOLD ...]   e.g. 160:8 32:16")
        return
    start_transfer_warmup()
    combos = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]] or \
        [(32, 16), (32, 32), (96, 8), (96, 16), (160, 4), (160, 8),
         (1024, 1), (1024, 2)]
    rng = np.random.default_rng(0)
    results = {}
    k0 = 8

    from shortseq_tpu.ops.bitpack import pack_words_u32

    for width, fold in combos:
        w4 = width // 4
        n = (1 << 23) // w4           # constant ~32 MB read per pass
        n -= n % (fold * 8)
        nts = n * width
        codes = rng.integers(0, 4, size=(k0 * n, width)).astype(np.uint8)
        mat = np.frombuffer(b"ACTG", np.uint8)[codes]
        base = np.ascontiguousarray(mat).view(np.uint32)

        # Correctness vs the production pack.
        chk = 1024 - (1024 % fold)
        ref = np.asarray(pack_words_u32(jnp.asarray(base[:chk])))
        pack1 = make_pack1(w4, fold)
        got = np.asarray(pack1(jnp.asarray(
            base[:chk].reshape(chk // fold, fold * w4))))
        w_out = w4 // 4
        fw = fold * w_out
        # folded row f, block [r*w, (r+1)*w) is logical row base+r's words
        got_rows = got.reshape(chk // fold, fold, w_out).reshape(chk, w_out)
        assert (got_rows == ref).all(), (width, fold)

        fused = make_fused_nzc(w4, fold)
        lens_f = jnp.full((n // fold, fold), width, jnp.int32)
        ok = np.asarray(fused(jnp.asarray(
            base[:chk].reshape(chk // fold, fold * w4)),
            jnp.full((chk // fold, fold), width, jnp.int32))[1])
        assert ok.all(), (width, fold)
        print(f"w{width} f{fold}: correctness ok", flush=True)

        x = jnp.asarray(base.reshape(k0 * n // fold, fold * w4))

        def fused_only(xx, fused=fused, lens_f=lens_f):
            w, okk = fused(xx, lens_f)
            return w ^ jnp.uint32(okk.all())

        fcat = make_fused_cat(w4, fold)

        def fusedcat_only(xx, fcat=fcat, lens_f=lens_f):
            w, okk = fcat(xx, lens_f)
            return w ^ jnp.uint32(okk.all())

        # The round-4 production kernel: pack + validity in ONE bf16 dot
        # (poisoned operand + ok-columns; ops.bitpack docstring).  The
        # pad_valid form is the headline driver metric; the masked form
        # is the general path.  These should WIN this sweep - if a
        # variant above beats them, the production dispatch is stale.
        from shortseq_tpu.ops.bitpack import pack_and_validate_folded

        def onedot_mask(xx, lens_f=lens_f, w4=w4):
            w, okk = pack_and_validate_folded(xx, lens_f, w4, unfold=False)
            return w ^ jnp.uint32(okk.all())

        def onedot_pad(xx, lens_f=lens_f, w4=w4):
            w, okk = pack_and_validate_folded(xx, lens_f, w4, unfold=False,
                                              pad_valid=True)
            return w ^ jnp.uint32(okk.all())

        variants = {
            "pack": pack1,
            "fused": fused_only,
            "fusedcat": fusedcat_only,
            "onedot_mask": onedot_mask,
            "onedot_pad": onedot_pad,
            "valmask": lambda xx, v=make_val_mask(w4, fold),
            lens_f=lens_f: v(xx, lens_f),
            "valnzc": lambda xx, v=make_val_nzc(w4, fold),
            lens_f=lens_f: v(xx, lens_f),
            "valnzc1": lambda xx, v=make_val_nzc1(w4, fold),
            lens_f=lens_f: v(xx, lens_f),
        }
        for name, fn in variants.items():
            loop = make_loop(fn, n // fold, k0)
            dt = slope_time(loop, (x,))
            results[f"{name}_w{width}_f{fold}"] = nts / dt / 1e9
        print({k: round(v, 1) for k, v in results.items()
               if f"w{width}_f{fold}" in k}, flush=True)

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
