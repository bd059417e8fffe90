"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding tests run anywhere (the JAX analogue of a fake process
group, which the torch reference lacks - SURVEY.md §4)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("DUST3R_TPU_NO_PALLAS", "1")

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override at the config level (must happen before any
# backend is instantiated).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute oracle/e2e files (excluded from the "
        "quick hot-path suite)")
    config.addinivalue_line(
        "markers", "quick: the hot-path suite (`-m quick`, ~<5 min); "
        "auto-applied to everything not marked slow")


def pytest_collection_modifyitems(config, items):
    # `python -m pytest -m quick` = everything not explicitly marked slow.
    # The FULL suite remains the pre-commit bar; quick is the dev loop.
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
