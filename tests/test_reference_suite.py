"""Run the REFERENCE's own unit-test suites against shortseq_tpu.

The reference test files are loaded in place from /root/reference (never
copied) with `shortseq` aliased to this package - the strongest parity
statement available: the upstream oracles pass verbatim.  Skipped when the
reference checkout is absent (e.g. public CI)."""

import importlib.util
import sys
import types
import unittest
from pathlib import Path

import pytest

REF_TESTS = Path("/root/reference/shortseq/tests")

pytestmark = pytest.mark.skipif(
    not REF_TESTS.is_dir(), reason="reference checkout not mounted")


def _load_inplace(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def alias():
    """Alias `shortseq` -> shortseq_tpu and expose the reference's pure-
    stdlib test helpers under shortseq.tests.util."""
    import shortseq_tpu

    saved = {k: sys.modules.get(k)
             for k in ("shortseq", "shortseq.tests", "shortseq.tests.util",
                       "shortseq.umi")}
    sys.modules["shortseq"] = shortseq_tpu
    tests_pkg = types.ModuleType("shortseq.tests")
    sys.modules["shortseq.tests"] = tests_pkg
    _load_inplace("shortseq.tests.util", REF_TESTS / "util.py")
    import shortseq_tpu.umi

    sys.modules["shortseq.umi"] = shortseq_tpu.umi
    yield
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _run_reference_file(path, name):
    mod = _load_inplace(name, path)
    loader = unittest.TestLoader()
    suite = loader.loadTestsFromModule(mod)
    result = unittest.TestResult()
    suite.run(result)
    details = "\n\n".join(
        f"{test}\n{tb}" for test, tb in result.failures + result.errors)
    assert result.wasSuccessful(), (
        f"{result.testsRun} run, {len(result.failures)} failures, "
        f"{len(result.errors)} errors\n{details[-5000:]}")
    assert result.testsRun > 0


def test_reference_unit_tests_main(alias):
    """The reference's primary oracle suite (515 LoC of randomized
    property tests: round-trips, hamming, slicing, sizes, rejection)."""
    _run_reference_file(REF_TESTS / "unit_tests_main.py",
                        "ref_unit_tests_main")


def test_reference_unit_tests_umi(alias):
    """The reference's UMI smoke tests."""
    _run_reference_file(REF_TESTS / "unit_tests_umi.py",
                        "ref_unit_tests_umi")
