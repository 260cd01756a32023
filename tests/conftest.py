"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Mirrors SURVEY.md §4's implication: multi-device tests run on
``xla_force_host_platform_device_count`` fakes (no real pod needed).
"""

import os
import sys

# sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at interpreter start
# and registers the axon TPU-tunnel platform, so env vars alone are read too
# late — jax.config.update wins as long as no backend has initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices())
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# -------------------------------------------------------------- tiering
# Two tiers (VERDICT r4 #9): the default ``pytest -q`` run excludes tests
# marked ``slow`` (subprocess multihost fixtures, engine chaos/property
# tests, full-descriptor campaigns) for a quick contributor signal;
# ``pytest --runslow`` runs everything.  Timings for both are recorded in
# README quickstart.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (subprocess/chaos/e2e tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (subprocess fixtures, chaos "
        "properties, full campaigns) — excluded unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: re-run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
