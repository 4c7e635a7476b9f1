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

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
