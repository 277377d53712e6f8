"""Count-table checkpoint / resume.

The reference is a pure in-memory library with no persistence (SURVEY.md
section 5).  For multi-shard / multi-host dedup runs, partial count tables
are the natural checkpoint unit: counting is associative, so resume is
"load the spilled tables and keep merging" - a crashed run never recounts
finished shards.

Format: one .npz per (host, shard) with the padded device table arrays
plus n_unique; merging N checkpoints = concatenate + one unique_count.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def save_table(path, u_words, u_lengths, u_counts, n_unique) -> None:
    """Spill a device count table (padded arrays straight from
    unique_count) to `path` (.npz, atomic via rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = int(n_unique)
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(
        tmp,
        words=np.asarray(u_words)[:n],
        lengths=np.asarray(u_lengths)[:n],
        counts=np.asarray(u_counts)[:n])
    os.replace(tmp, path)


def load_table(path):
    """Load a spilled table -> (words [M, W] uint32, lengths [M] int32,
    counts [M] int32) host arrays."""
    with np.load(path) as z:
        return z["words"], z["lengths"], z["counts"]


def check_manifest(directory, **params) -> None:
    """Guard against resuming with incompatible parameters: shard tables
    are keyed by (host, shard), so reusing a checkpoint dir with a
    different file / shard count / host count would silently merge wrong
    counts.  Writes `manifest.json` on first use; raises if an existing
    manifest disagrees."""
    import json

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / "manifest.json"
    if path.exists():
        existing = json.loads(path.read_text())
        if existing != params:
            raise ValueError(
                f"checkpoint dir {directory} was written with "
                f"{existing}, now asked to resume with {params}; "
                "clear the directory or use a fresh one")
        return
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(params))
    os.replace(tmp, path)


def file_fingerprint(path, n_probes: int = 16) -> str:
    """Content fingerprint guarding checkpoint resume against a modified
    input of identical size (common for fixed-length-read FASTQs, where
    one corrected base leaves the size unchanged).

    Files <= 32 MiB are hashed in full (sha256, ~70 ms worst case), so any
    edit is caught.  Larger files hash the size, the first and last
    64 KiB, and 64 KiB probes at n_probes evenly spaced interior offsets -
    a sampling guard: an edit between probes can escape, which is the
    stated trade-off for keeping resume O(MiB) on arbitrarily large
    inputs."""
    import hashlib

    size = os.path.getsize(path)
    h = hashlib.sha256()
    h.update(str(size).encode())
    block = 65536
    with open(path, "rb") as f:
        if size <= (32 << 20):
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
            return h.hexdigest()[:32]
        h.update(f.read(block))
        for i in range(1, n_probes + 1):
            off = size * i // (n_probes + 1)
            if off <= block or off >= size - block:
                continue
            f.seek(off)
            h.update(f.read(block))
        f.seek(size - block)
        h.update(f.read(block))
    return h.hexdigest()[:32]


def shard_path(directory, host: int, shard: int) -> Path:
    return Path(directory) / f"counts_h{host:04d}_s{shard:06d}.npz"


def completed_shards(directory, host: int):
    """Shard indices already checkpointed for `host` (for resume)."""
    directory = Path(directory)
    if not directory.is_dir():
        return set()
    prefix = f"counts_h{host:04d}_s"
    out = set()
    for p in directory.glob(f"{prefix}*.npz"):
        try:
            out.add(int(p.stem[len(prefix):]))
        except ValueError:
            continue
    return out


def empty_table(width: int = 1):
    """Canonical empty device table: the one pad row carries the
    PAD_LENGTH sentinel (length 0 is a live value - an empty read - and
    sentinel-filtering consumers would emit it as a phantom key)."""
    import jax.numpy as jnp

    from .device import PAD_LENGTH

    return (jnp.zeros((1, width), jnp.uint32),
            jnp.full(1, PAD_LENGTH, jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.int32(0))


def merge_host_tuples(host_tables, n_out: int | None = None):
    """Merge host (words, lengths, counts) tuples exactly: one zero-padded
    concat + one device unique_count.  The single concat-and-count helper
    behind merge_tables and dist.pipeline's merges.

    The concatenated row count is padded to a quarter-pow2 step (>= 256)
    with PAD_LENGTH rows (weight 0, dropped exactly by unique_count):
    merge sizes are data-dependent, and an unpadded shape would recompile
    the large multi-operand sort for virtually every merge, while plain
    pow2 wastes up to +100% of the h2d transfer and sort rows at unlucky
    sizes (see ingest.quarter_pow2)."""
    import jax.numpy as jnp

    from .device import PAD_LENGTH, unique_count
    from .ingest import quarter_pow2

    widths = [w.shape[1] for w, _, _ in host_tables if w.size]
    width = max(widths) if widths else 1
    total = sum(len(l) for _, l, _ in host_tables)
    if total == 0:
        return empty_table(width)
    total_pad = quarter_pow2(total)
    words = np.zeros((total_pad, width), np.uint32)
    lengths = np.full(total_pad, PAD_LENGTH, np.int32)
    counts = np.zeros(total_pad, np.int32)
    row = 0
    for w, l, c in host_tables:
        words[row:row + len(l), :w.shape[1]] = w
        lengths[row:row + len(l)] = l
        counts[row:row + len(l)] = c
        row += len(l)
    return unique_count(jnp.asarray(words), jnp.asarray(lengths),
                        jnp.asarray(counts), n_out=n_out)


def merge_tables(paths, n_out: int | None = None):
    """Merge spilled tables exactly: concatenate + one device unique_count.
    Returns (u_words, u_lengths, u_counts, n_unique) device arrays."""
    return merge_host_tuples([load_table(p) for p in paths], n_out=n_out)
