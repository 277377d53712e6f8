"""UMI deduplication: batched pairwise-hamming clustering.

The capability the reference's alpha subpackage aimed at but never
finished (reference umi/README.md:1); semantics follow the established
umi_tools algorithms the reference benchmarks against
(tests/benchmark.py's umi_tools edit-distance comparison):

  unique       - exact UMIs only (degenerate case: one cluster per UMI)
  cluster      - connected components of the <=threshold hamming graph
  adjacency    - greedy: highest-count node absorbs its direct neighbours,
                 repeat on the remainder
  directional  - edge u->v only if count(u) >= 2*count(v) - 1; clusters
                 are BFS trees from high-count roots (the umi_tools default
                 and the standard for sequencing-error collapse)

Device side: UMIs are packed 2-bit words; the all-pairs distance matrix
comes from the XOR + collapse + popcount kernel (ops/hamming.py, tiled
Pallas variant in ops/pallas_kernels.py) - O(U^2) lane-parallel work in
ONE dispatch over all unique UMIs (read-level dedup masks the matrix by
insert-group id rather than dispatching per group, because per-dispatch
latency, not compute, dominates small batches).  Host side: graph collapse
on the (small) unique set.
"""

from __future__ import annotations

import numpy as np

from ..constants import MAX_64_NT

# Above this many unique keys the dense [U, U] distance matrix (int32)
# exceeds ~1 GB; read-level dedup falls back to per-insert-group batches.
MAX_DENSE_UNIQUE = 16384

_METHODS = ("unique", "cluster", "adjacency", "directional")


def _pack_validate_umis(uniq):
    """Pack a list of unique UMI bytes -> ([U, 2] words, [U] lengths),
    raising the reference's error on any invalid base."""
    import jax.numpy as jnp

    from ..constants import UNSUPPORTED_BASE_MSG
    from ..ops.bitpack import pack_and_validate
    from ..utils.warmup import start_transfer_warmup

    for u in uniq:
        if len(u) > MAX_64_NT:
            raise ValueError("UMIs longer than 32 nt are not supported")
    start_transfer_warmup()
    width = 32
    mat = np.zeros((len(uniq), width), np.uint8)
    lengths = np.zeros(len(uniq), np.int32)
    for i, u in enumerate(uniq):
        mat[i, :len(u)] = np.frombuffer(u, np.uint8)
        lengths[i] = len(u)
    words, ok = pack_and_validate(jnp.asarray(mat), jnp.asarray(lengths))
    ok = np.asarray(ok)
    if not ok.all():
        bad = uniq[int(np.argmin(ok))].decode("ascii", "replace")
        raise Exception(f"{UNSUPPORTED_BASE_MSG} in UMI {bad!r}")
    return words, lengths


def umi_adjacency(words, lengths, threshold: int = 1) -> np.ndarray:
    """[U, W] packed UMIs -> boolean [U, U] adjacency (hamming <= threshold
    and equal length).  Uses the tiled Pallas kernel on TPU, the jnp
    broadcast fallback elsewhere."""
    from ..ops import pairwise_hamming_auto

    dist = np.asarray(pairwise_hamming_auto(words, words))
    same_len = np.equal.outer(np.asarray(lengths), np.asarray(lengths))
    return (dist <= threshold) & same_len


def _components(adj):
    """Connected components; returns root label per node."""
    u = adj.shape[0]
    labels = np.full(u, -1, np.int64)
    for seed in range(u):
        if labels[seed] >= 0:
            continue
        stack = [seed]
        labels[seed] = seed
        while stack:
            node = stack.pop()
            for nbr in np.flatnonzero(adj[node]):
                if labels[nbr] < 0:
                    labels[nbr] = seed
                    stack.append(nbr)
    return labels


def _greedy_absorb(adj, counts, directional: bool):
    """adjacency / directional collapse: iterate nodes by descending count;
    an unassigned node roots a cluster and absorbs unassigned neighbours
    (direct for adjacency; BFS through count-ordered edges for
    directional, edge u->v iff counts[u] >= 2 * counts[v] - 1)."""
    u = adj.shape[0]
    labels = np.full(u, -1, np.int64)
    order = np.argsort(-counts, kind="stable")
    for root in order:
        if labels[root] >= 0:
            continue
        labels[root] = root
        frontier = [root]
        while frontier:
            node = frontier.pop()
            for nbr in np.flatnonzero(adj[node]):
                if labels[nbr] >= 0:
                    continue
                if directional and counts[node] < 2 * counts[nbr] - 1:
                    continue
                labels[nbr] = root
                if directional:
                    frontier.append(nbr)
        # adjacency method: only direct neighbours of the root absorb,
        # handled by not extending the frontier above.
    return labels


def _collapse(adj, counts, method):
    """Root label per node for the given method (adj diagonal is ignored)."""
    np.fill_diagonal(adj, False)
    if method == "cluster":
        return _components(adj)
    return _greedy_absorb(adj, counts, method == "directional")


def _relabel(roots, counts):
    """roots -> (dense cluster labels 0..C-1, representative node per
    cluster = the max-count member)."""
    root_ids = {}
    rep_nodes = []
    labels = np.empty(len(roots), np.int64)
    for i in range(len(roots)):
        r = roots[i]
        if r not in root_ids:
            root_ids[r] = len(rep_nodes)
            members = np.flatnonzero(roots == r)
            rep_nodes.append(int(members[np.argmax(counts[members])]))
        labels[i] = root_ids[r]
    return labels, rep_nodes


def split_read(read: bytes, len_5p: int, len_3p: int):
    """(5' UMI, insert, 3' UMI) split shared by UMIFactory and dedup_reads.

    A read that is entirely UMI yields an empty insert."""
    if len_5p < 0 or len_3p < 0:
        raise ValueError("UMI lengths must be non-negative")
    n = len(read)
    if n < len_5p + len_3p:
        raise ValueError(
            f"Read of {n} nt is shorter than the UMI lengths "
            f"({len_5p} + {len_3p})")
    umi5 = read[:len_5p]
    umi3 = read[n - len_3p:] if len_3p else b""
    insert = read[len_5p:n - len_3p]
    return umi5, insert, umi3


def dedup_umis(umis, threshold: int = 1, method: str = "directional"):
    """Collapse a list of UMIs (str/bytes) into clusters.

    Returns (labels, representatives): `labels[i]` is the cluster id of
    input i (ids are indices into `representatives`), and
    `representatives[c]` is the highest-count UMI of cluster c (bytes).
    """
    import collections

    if method not in _METHODS:
        raise ValueError(f"Unknown method: {method}")
    if len(umis) == 0:
        return np.zeros(0, np.int64), []

    norm = [u.encode("ascii") if isinstance(u, str) else bytes(u)
            for u in umis]
    counter = collections.Counter(norm)
    uniq = list(counter)
    index = {u: i for i, u in enumerate(uniq)}
    inverse = np.fromiter((index[u] for u in norm), np.int64, len(norm))
    counts = np.fromiter((counter[u] for u in uniq), np.int64, len(uniq))

    words, lengths = _pack_validate_umis(uniq)
    u = len(uniq)
    if method == "unique" or u == 1:
        roots = np.arange(u)
    else:
        roots = _collapse(umi_adjacency(words, lengths, threshold),
                          counts, method)
    labels_u, rep_nodes = _relabel(roots, counts)
    return labels_u[inverse], [uniq[i] for i in rep_nodes]


def dedup_reads(reads, len_5p: int = 0, len_3p: int = 0,
                threshold: int = 1, method: str = "directional"):
    """Full UMI read deduplication: reads carrying UMIs on the 5'/3' ends
    are grouped by insert sequence, and within each group the UMIs are
    clustered (sequencing-error collapse); each cluster is one original
    molecule.  The standard umi_tools-style dedup workflow, which the
    reference's alpha subpackage was building toward.

    All groups are clustered in ONE device pass: the pairwise distance
    matrix over all unique (insert-group, UMI) pairs is masked so edges
    never cross groups - per-dispatch latency dominates per-group batches.
    Above MAX_DENSE_UNIQUE unique pairs the dense matrix would exceed ~1 GB
    and the collapse falls back to per-group batches.

    Args:
      reads: list of str/bytes (UMI(s) still attached).
      len_5p/len_3p: UMI lengths clipped from each end.
    Returns:
      (labels, molecules): `labels[i]` is the molecule id of read i;
      `molecules[m]` is `(insert_bytes, umi_bytes)` for molecule m (the
      highest-count UMI of its cluster).
    """
    import collections

    if method not in _METHODS:
        raise ValueError(f"Unknown method: {method}")
    if len_5p < 0 or len_3p < 0:
        raise ValueError("UMI lengths must be non-negative")
    if len_5p + len_3p == 0:
        raise ValueError("at least one UMI length must be positive")
    if len_5p + len_3p > MAX_64_NT:
        raise ValueError("UMIs longer than 32 nt are not supported")
    if len(reads) == 0:
        return np.zeros(0, np.int64), []

    norm = [r.encode("ascii") if isinstance(r, str) else bytes(r)
            for r in reads]
    gid_of = {}
    inserts = []
    keys = []  # per-read (gid, umi)
    for r in norm:
        u5, insert, u3 = split_read(r, len_5p, len_3p)
        gid = gid_of.setdefault(insert, len(gid_of))
        if gid == len(inserts):
            inserts.append(insert)
        keys.append((gid, u5 + u3))

    counter = collections.Counter(keys)
    uniq = list(counter)
    index = {k: i for i, k in enumerate(uniq)}
    inverse = np.fromiter((index[k] for k in keys), np.int64, len(keys))
    counts = np.fromiter((counter[k] for k in uniq), np.int64, len(uniq))
    gids = np.fromiter((g for g, _ in uniq), np.int64, len(uniq))

    # Validation is uniform: every unique UMI goes through the packed
    # validity check regardless of which collapse path runs below.
    words, lengths = _pack_validate_umis([u for _, u in uniq])

    u = len(uniq)
    if method == "unique" or u == 1:
        roots = np.arange(u)
    elif u <= MAX_DENSE_UNIQUE:
        adj = umi_adjacency(words, lengths, threshold)
        adj &= np.equal.outer(gids, gids)      # edges never cross inserts
        roots = _collapse(adj, counts, method)
    else:
        # Dense matrix would be too large: collapse group by group.
        roots = np.arange(u)
        for gid in range(len(inserts)):
            members = np.flatnonzero(gids == gid)
            if len(members) < 2:
                continue
            sub_adj = umi_adjacency(
                words[members], lengths[members], threshold)
            sub_roots = _collapse(sub_adj, counts[members], method)
            roots[members] = members[sub_roots]

    labels_u, rep_nodes = _relabel(roots, counts)
    molecules = [(inserts[uniq[i][0]], uniq[i][1]) for i in rep_nodes]
    return labels_u[inverse], molecules
