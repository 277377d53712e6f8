"""Pallas TPU kernels for the hot ops.

Design notes (why these and not others):

* 2-bit packing is NOT here: the XLA path in ops/bitpack.py lowers to a
  single fused VPU pass over the byte stream (measured memory-bandwidth
  bound on v5e), and Mosaic currently rejects both formulations a Pallas
  version needs (sub-word bitcasts and 16-strided lane slices).  A custom
  kernel has nothing left to win there.

* All-pairs hamming IS here: the jnp broadcast version materializes an
  [N, M, W] XOR intermediate in HBM for large problems, while the tiled
  kernel keeps [TN, W] x [TM, W] operand tiles and a [TN, TM] accumulator
  in VMEM, reading each operand row N/TN (resp. M/TM) times from HBM
  instead of once per pair.  This is the O(U^2) workhorse of UMI
  clustering (umi/dedup.py).

Kernels fall back to the jnp ops off-TPU (the CPU Mosaic backend does not
support all patterns) and on any lowering failure - correctness never
depends on Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import hamming_pairwise

_TILE = 128


def _pairwise_kernel(w: int):
    def kernel(a_ref, b_ref, out_ref):
        acc = jnp.zeros((_TILE, _TILE), jnp.int32)
        for lane in range(w):
            c = a_ref[:, lane][:, None] ^ b_ref[:, lane][None, :]
            c = ((c >> 1) | c) & jnp.uint32(0x55555555)
            acc = acc + jax.lax.population_count(c).astype(jnp.int32)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=())
def _pairwise_tiled(a: jax.Array, b: jax.Array) -> jax.Array:
    n, w = a.shape
    m, _ = b.shape
    grid = (n // _TILE, m // _TILE)
    return pl.pallas_call(
        _pairwise_kernel(w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * w, transcendentals=0,
            bytes_accessed=4 * (n * w * (m // _TILE)
                                + m * w * (n // _TILE) + n * m)),
    )(a, b)


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def hamming_pairwise_tiled(a: jax.Array, b: jax.Array) -> jax.Array:
    """All-pairs hamming `[N, W] x [M, W] -> [N, M]` via the tiled Pallas
    kernel; inputs are row-padded to the 128 tile internally."""
    n, m = a.shape[0], b.shape[0]
    out = _pairwise_tiled(_pad_rows(a, _TILE), _pad_rows(b, _TILE))
    return out[:n, :m]


def pairwise_hamming_auto(a: jax.Array, b: jax.Array) -> jax.Array:
    """Tiled Pallas kernel on TPU, jnp broadcast elsewhere / on failure."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if jax.devices()[0].platform == "tpu":
        try:
            return hamming_pairwise_tiled(a, b)
        except Exception:
            pass
    return hamming_pairwise(a, b)
