"""Test configuration: run JAX on a simulated 8-device CPU mesh so the
multi-chip sharding paths are exercised without a pod
(SURVEY.md section 4 implication)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


def rand_sequence(rng, length):
    """Uniform ACTG sequence, mirroring the reference's test generator
    (reference shortseq/tests/util.py:28-40)."""
    return "".join(rng.choice("ACTG") for _ in range(length))
