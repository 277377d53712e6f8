"""Test configuration.

Multi-chip note: in this environment a sitecustomize module imports jax at
interpreter startup and registers the single real TPU chip, so the usual
in-process trick (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count)
cannot take effect here.  Tests therefore run on whatever backend the
interpreter booted with; the true 8-device CPU-mesh checks run in a
subprocess with a scrubbed environment (see test_multichip.py), matching
how the driver validates the sharded path.
"""

import os
import random

import pytest

# Harmless when sitecustomize already pinned a backend; effective when the
# suite runs in a clean environment (CI without the axon boot hook).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scrubbed_cpu_env(n_devices=8):
    """Environment for subprocess tests that need an n-device CPU mesh:
    drops the sitecustomize PYTHONPATH hook and forces the CPU platform.
    The repo root is derived from this file (not hardcoded) so the suite
    runs from any checkout location, including CI."""
    env = dict(os.environ)
    # Scrub only entries that carry a sitecustomize hook (the TPU-pinning
    # boot module); keep the rest, so a suite running against an
    # installed package (CI's package-isolation job) still resolves it.
    kept = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and not os.path.exists(os.path.join(p, "sitecustomize.py"))]
    env["PYTHONPATH"] = os.pathsep.join([REPO_ROOT] + kept)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.fixture(scope="session", autouse=True)
def _warm_device_transfers():
    """Start the one-time device->host handshake at session start so it
    overlaps the host-only tests instead of stalling the first fetch
    (docs/ENVIRONMENT.md item 1)."""
    from shortseq_tpu.utils.warmup import start_transfer_warmup

    start_transfer_warmup()


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


def rand_sequence(rng, length):
    """Uniform ACTG sequence, mirroring the reference's test generator
    (reference shortseq/tests/util.py:28-40)."""
    return "".join(rng.choice("ACTG") for _ in range(length))
