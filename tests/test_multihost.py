"""Multi-host (multi-process) smoke test for initialize_multihost.

Launches TWO real OS processes, each with 4 fake CPU devices, joins
them through jax.distributed (the DCN path of SURVEY.md §5 /
BASELINE stretch config #5), builds the SAME ("data", "ensemble")
mesh used in production across the 8 global devices, and runs a
jitted global-mean reduction over a data-sharded global array — the
cross-process collective the gradient psum rides on.

Skips (not fails) when the local CPU collectives runtime cannot form
a cluster — the capability under test is wiring, not this machine.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

sys.path.insert(0, os.getcwd())  # repo root (parent sets cwd)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from tpuflow.train.mesh import data_sharding, make_mesh, replicated_sharding
from tpuflow.train.mesh import initialize_multihost

initialize_multihost(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2, jax.process_count()

mesh = make_mesh(data=8, ensemble=1)
ds = data_sharding(mesh)

# Each process contributes its local half of a global (8, 4) batch.
local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
garr = jax.make_array_from_process_local_data(ds, local[pid * 4:(pid + 1) * 4])
assert garr.shape == (8, 4)

@jax.jit
def global_mean(x):
    return x.mean()  # cross-process reduction over the data axis

out = jax.jit(global_mean, out_shardings=replicated_sharding(mesh))(garr)
val = float(out)
expected = float(local.mean())
assert abs(val - expected) < 1e-6, (val, expected)

# Full production train step across the two processes: data-sharded
# batch, replicated params, XLA's gradient all-reduce rides the
# cross-process channel (the DCN analogue of the NCCL all-reduce).
import jax.numpy as jnp
from tpuflow.configs.config import ModelConfig
from tpuflow.data import generate_case
from tpuflow.models import TMGlow, init_lstm_state
from tpuflow.train.step import make_optimizer, make_train_step

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)
model = TMGlow(MC)
lf, hf = generate_case("backward-step", 8, 2, MC.hf_shape, MC.lf_shape, 1)
state_h = init_lstm_state(MC, (8,))
variables = model.init(
    jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]),
    init_lstm_state(MC, (8,)),
)
opt = make_optimizer(1e-3, 1.0, 10.0)
opt_state = opt.init(variables["params"])

rep = replicated_sharding(mesh)
params = jax.device_put(variables["params"], rep)
buffers = jax.device_put(variables.get("buffers", {}), rep)
opt_state = jax.device_put(opt_state, rep)
lo, hi = pid * 4, (pid + 1) * 4
lf_g = jax.make_array_from_process_local_data(ds, np.asarray(lf[lo:hi]))
hf_g = jax.make_array_from_process_local_data(ds, np.asarray(hf[lo:hi]))
state_g = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(ds, np.asarray(x[lo:hi])),
    state_h,
)
step = jax.jit(make_train_step(model, opt, remat=False))
params2, _, _, metrics = step(params, buffers, opt_state, lf_g, hf_g, state_g)
bpd = float(metrics["bpd"])
checksum = float(
    sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(params2))
)
with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write(f"{val} {bpd} {checksum}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_two_process_mesh_collective(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"
    # cwd = repo root for imports; PYTHONPATH would break this
    # machine's TPU plugin registration at interpreter startup
    # (.claude/skills/verify gotchas) even though the worker forces CPU.
    repo = pathlib.Path(__file__).parent.parent
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid), str(tmp_path)],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process CPU cluster did not form in time")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "UNIMPLEMENTED" in joined or "not available" in joined.lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {joined[-300:]}")
        raise AssertionError(f"worker failed:\n{joined[-3000:]}")
    rows = [
        [float(x) for x in (tmp_path / f"ok_{pid}").read_text().split()]
        for pid in (0, 1)
    ]
    np.testing.assert_allclose(rows[0], rows[1], rtol=1e-6)
    np.testing.assert_allclose(rows[0][0], np.arange(32).mean())

    # Cross-check the distributed update against a single-process run
    # of the identical step (this test process has 8 fake devices).
    import jax
    import jax.numpy as jnp

    from tpuflow.configs.config import ModelConfig
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state
    from tpuflow.train.step import make_optimizer, make_train_step

    MC = ModelConfig(
        n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
        lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
        encoder_width=8, lstm_hidden=8, cond_channels=8,
        compute_dtype="float32", use_pallas=False,
    )
    model = TMGlow(MC)
    lf, hf = generate_case("backward-step", 8, 2, MC.hf_shape, MC.lf_shape, 1)
    state = init_lstm_state(MC, (8,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]),
        init_lstm_state(MC, (8,)),
    )
    opt = make_optimizer(1e-3, 1.0, 10.0)
    step = jax.jit(make_train_step(model, opt, remat=False))
    params2, _, _, metrics = step(
        variables["params"], variables.get("buffers", {}),
        opt.init(variables["params"]), jnp.asarray(lf), jnp.asarray(hf), state,
    )
    np.testing.assert_allclose(rows[0][1], float(metrics["bpd"]), rtol=1e-5)
    checksum = float(
        sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(params2))
    )
    np.testing.assert_allclose(rows[0][2], checksum, rtol=1e-5)
