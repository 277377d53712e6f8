"""Device mesh construction and multi-host bring-up.

One mesh axis is all this domain needs (SURVEY.md section 2): reads are
independent, blocks of one read live in the lane axis on a single chip, so
`data` is the only distributed dimension.  Collectives ride ICI within a
slice and DCN across hosts; XLA picks the routing from the mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> None:
    """Multi-controller bring-up (`jax.distributed.initialize`).

    No-op when running single-process (the common dev path); on a pod
    slice each host calls this before building the mesh.  The reference has
    no equivalent - it is single-process by construction.
    """
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def data_mesh(devices=None) -> Mesh:
    """A 1-D `data` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), axis_names=("data",))
