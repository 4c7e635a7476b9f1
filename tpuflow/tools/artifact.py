"""Leaf loader for exported rollout artifacts — jax + numpy only.

Kept free of model/data/training imports so a minimal serving host
(`tpuflow.tools.serve`, or any process that just wants `.call(...)`)
does not pull Flax/Orbax/the model stack: deserializing the artifact
rebuilds the whole compiled rollout by itself.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
from jax import export as jax_export


def load_artifact(path):
    """Deserialize a rollout artifact, ready to ``.call(lf, seed, tau)``.

    Performs the LAPACK registration warmup first: jaxlib only
    registers the CPU custom-call targets (the LU solves baked into
    the flow's 1x1 inverses) when a linalg op is lowered in-process;
    executing a deserialized artifact without that registration
    segfaults (measured on jaxlib in this image — minimal repro:
    export jnp.linalg.solve, deserialize in a fresh process, call).
    """
    jax.jit(jnp.linalg.inv).lower(jnp.eye(2)).compile()
    return jax_export.deserialize(pathlib.Path(path).read_bytes())
