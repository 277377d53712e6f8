"""UMI (Unique Molecular Identifier) handling.

Object surface mirrors the reference's alpha subpackage (reference
shortseq/umi/umi.pyx, exercised by tests/unit_tests_umi.py:6-29): `UMI`,
`UMI5p`, `UMI3p`, `UMIboth`, and `UMIFactory(len_5p=, len_3p=)` whose
`from_bytes` splits a read into 5'/3' UMIs plus the remaining insert.

The real capability - what the reference left unfinished
(umi/README.md:1) - is deduplication: `dedup_umis` clusters UMIs by
batched pairwise hamming distance on device (BASELINE.json config 5) with
umi_tools-style `unique` / `cluster` / `adjacency` / `directional`
semantics.
"""

from .objects import UMI, UMI5p, UMI3p, UMIboth, UMIFactory
from .dedup import dedup_reads, dedup_umis, umi_adjacency

__all__ = [
    "UMI", "UMI5p", "UMI3p", "UMIboth", "UMIFactory",
    "dedup_reads", "dedup_umis", "umi_adjacency",
]
