"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so the
shard_map / pjit data- and ensemble-parallel paths are exercised with
no TPU attached (SURVEY.md §4 "Distributed-without-a-cluster").

Note: this environment registers a TPU PJRT plugin from
``sitecustomize`` at interpreter startup and force-selects it via
``jax.config`` — the ``JAX_PLATFORMS`` env var alone does NOT override
it; the config update below does.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()


def pytest_collection_modifyitems(config, items):
    """Tier markers (VERDICT r4 item 8; docs/OPERATIONS.md).

    - tests/test_converged.py = the committed-artifact tier
      (``converged``): cheap JSON/CSV pins over runs/ evidence.
    - anything explicitly ``@pytest.mark.slow`` = the heavy tier.
    - everything else gets ``fast`` automatically, so ``pytest -m
      fast`` is a maintained sub-5-minute iteration tier without
      hand-marking every test. Converged pins are cheap, so they are
      in the fast tier too (both markers apply).
    """
    for item in items:
        if "test_converged" in str(item.fspath):
            item.add_marker(pytest.mark.converged)
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
