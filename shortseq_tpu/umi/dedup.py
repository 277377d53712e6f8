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
Pallas variant in ops/pallas_kernels.py) - O(U^2) lane-parallel work.
Host side: graph collapse on the (small) unique-UMI set.
"""

from __future__ import annotations

import numpy as np

from ..constants import MAX_64_NT


def _pack_unique(umis):
    """Host: list of str/bytes UMIs -> (unique words [U, 2], lengths [U],
    counts [U], inverse [N])."""
    import collections

    norm = [u.encode("ascii") if isinstance(u, str) else bytes(u)
            for u in umis]
    for u in norm:
        if len(u) > MAX_64_NT:
            raise ValueError("UMIs longer than 32 nt are not supported")
    counter = collections.Counter(norm)
    uniq = list(counter)
    index = {u: i for i, u in enumerate(uniq)}
    inverse = np.fromiter((index[u] for u in norm), np.int64, len(norm))
    counts = np.fromiter((counter[u] for u in uniq), np.int64, len(uniq))

    import jax.numpy as jnp

    from ..constants import UNSUPPORTED_BASE_MSG
    from ..ops.bitpack import pack_and_validate
    from ..utils.warmup import start_transfer_warmup

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
    return words, lengths, counts, inverse, uniq


def umi_adjacency(words, lengths, threshold: int = 1) -> np.ndarray:
    """[U, W] packed UMIs -> boolean [U, U] adjacency (hamming <= threshold
    and equal length).  Uses the tiled Pallas kernel on TPU, the jnp
    broadcast fallback elsewhere."""
    import jax.numpy as jnp

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


def dedup_reads(reads, len_5p: int = 0, len_3p: int = 0,
                threshold: int = 1, method: str = "directional"):
    """Full UMI read deduplication: reads carrying UMIs on the 5'/3' ends
    are grouped by insert sequence, and within each group the UMIs are
    clustered (sequencing-error collapse); each cluster is one original
    molecule.  The standard umi_tools-style dedup workflow, which the
    reference's alpha subpackage was building toward.

    Args:
      reads: list of str/bytes (UMI(s) still attached).
      len_5p/len_3p: UMI lengths clipped from each end.
    Returns:
      (labels, molecules): `labels[i]` is the molecule id of read i;
      `molecules[m]` is `(insert_bytes, umi_bytes)` for molecule m (the
      highest-count UMI of its cluster).
    """
    import collections

    if len_5p + len_3p == 0:
        raise ValueError("at least one UMI length must be positive")
    norm = [r.encode("ascii") if isinstance(r, str) else bytes(r)
            for r in reads]
    split = []
    for r in norm:
        if len(r) < len_5p + len_3p:
            raise ValueError(
                f"Read of {len(r)} nt is shorter than the UMI lengths "
                f"({len_5p} + {len_3p})")
        umi = r[:len_5p] + (r[len(r) - len_3p:] if len_3p else b"")
        insert = r[len_5p:len(r) - len_3p or len(r)]
        split.append((umi, insert))

    groups = collections.defaultdict(list)
    for i, (_, insert) in enumerate(split):
        groups[insert].append(i)

    labels = np.empty(len(norm), np.int64)
    molecules = []
    for insert, idxs in groups.items():
        umis = [split[i][0] for i in idxs]
        if len(set(umis)) == 1:  # no clustering needed (the common case)
            for i in idxs:
                labels[i] = len(molecules)
            molecules.append((insert, umis[0]))
            continue
        glabels, greps = dedup_umis(umis, threshold, method)
        base = len(molecules)
        for i, gl in zip(idxs, glabels):
            labels[i] = base + int(gl)
        molecules.extend((insert, rep) for rep in greps)
    return labels, molecules


def dedup_umis(umis, threshold: int = 1, method: str = "directional"):
    """Collapse a list of UMIs (str/bytes) into clusters.

    Returns (labels, representatives): `labels[i]` is the cluster id of
    input i (ids are indices into `representatives`), and
    `representatives[c]` is the highest-count UMI of cluster c (bytes).
    """
    if method not in ("unique", "cluster", "adjacency", "directional"):
        raise ValueError(f"Unknown method: {method}")
    if len(umis) == 0:
        return np.zeros(0, np.int64), []

    words, lengths, counts, inverse, uniq = _pack_unique(umis)
    u = len(uniq)
    if method == "unique" or u == 1:
        roots = np.arange(u)
    else:
        adj = umi_adjacency(words, lengths, threshold)
        np.fill_diagonal(adj, False)
        if method == "cluster":
            roots = _components(adj)
        else:
            roots = _greedy_absorb(adj, counts, method == "directional")

    # Re-label clusters 0..C-1 by root, pick max-count member as rep.
    root_ids = {}
    reps = []
    labels_u = np.empty(u, np.int64)
    for i in range(u):
        r = roots[i]
        if r not in root_ids:
            root_ids[r] = len(reps)
            # Root is the first (max-count) member for greedy methods; for
            # components pick the max-count member of the whole cluster.
            members = np.flatnonzero(roots == r)
            reps.append(uniq[members[np.argmax(counts[members])]])
        labels_u[i] = root_ids[r]
    return labels_u[inverse], reps
