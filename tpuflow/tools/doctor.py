"""Environment doctor: is this machine ready to train/serve tpuflow?

Parity context: SURVEY.md §5 "Failure detection" — the reference has
none; tpuflow's operational reality (remote TPU tunnels that HANG
rather than error at client init) makes a bounded environment probe a
first-class tool. Every accelerator check runs in a SUBPROCESS with a
timeout, so a wedged tunnel yields a FAIL line instead of hanging the
doctor itself (the exact failure mode documented in
docs/OPERATIONS.md troubleshooting).

Usage:
  python -m tpuflow.tools.doctor [--probe-timeout=110] [--json]

Checks:
  imports     tpuflow + core deps importable, versions
  device      default-platform jax.devices() in a bounded subprocess
              (timeout => "wedged or unreachable", the tunnel signature)
  cpu         forced-CPU backend executes a tiny jit
  mesh        8 virtual CPU devices; ("data","ensemble") mesh + psum
  native      C++ streaming loader compiles (g++) or memmap fallback
  optional    h5py / matplotlib / tensorflow(TensorBoard) availability

Exit 0 if everything required passed (device check is WARN-only: CPU
work is still possible while a tunnel is down).
"""

from __future__ import annotations

import json
import subprocess
import sys

_CPU_FORCE = "import jax; jax.config.update('jax_platforms','cpu'); "


def _sub(code: str, timeout: float, env_extra: dict | None = None) -> tuple[bool, str]:
    """Run python -c code in a subprocess; (ok, last-line-or-error)."""
    import os

    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return False, f"timed out after {timeout:.0f}s"
    if out.returncode != 0:
        err = (out.stderr or "").strip().splitlines()
        return False, err[-1] if err else f"exit {out.returncode}"
    lines = (out.stdout or "").strip().splitlines()
    return True, lines[-1] if lines else ""


def run_checks(probe_timeout: float = 110.0) -> dict:
    checks: dict[str, dict] = {}

    def record(name, ok, detail, required=True):
        checks[name] = {"ok": bool(ok), "detail": str(detail),
                        "required": required}

    # imports + versions (in-process: cheap, no accelerator touch).
    try:
        import flax
        import jax
        import optax
        import orbax.checkpoint as ocp

        import tpuflow

        record(
            "imports", True,
            f"tpuflow {getattr(tpuflow, '__version__', '?')}, "
            f"jax {jax.__version__}, flax {flax.__version__}, "
            f"optax {optax.__version__}, orbax {ocp.__version__}",
        )
    except Exception as e:
        record("imports", False, f"{type(e).__name__}: {e}")
        return {"checks": checks, "ok": False}

    # Default-platform device probe — the wedge detector. WARN-only.
    ok, detail = _sub(
        "import jax; print(jax.devices())", timeout=probe_timeout
    )
    if not ok and "timed out" in detail:
        detail += (" — accelerator tunnel wedged or unreachable "
                   "(see docs/OPERATIONS.md troubleshooting); "
                   "CPU workflows still available")
    record("device", ok, detail, required=False)

    # Forced-CPU execution.
    ok, detail = _sub(
        _CPU_FORCE
        + "import jax.numpy as jnp; "
        "print(float(jax.jit(lambda x: (x @ x).sum())(jnp.eye(8))))",
        timeout=240,
    )
    record("cpu", ok, detail if not ok else "tiny jit executed")

    # Virtual 8-device mesh + collective.
    ok, detail = _sub(
        _CPU_FORCE
        + "from tpuflow.train.mesh import make_mesh; "
        "import jax, jax.numpy as jnp; "
        "from jax.experimental.shard_map import shard_map; "
        "from jax.sharding import PartitionSpec as P; "
        "mesh = make_mesh(data=4, ensemble=2); "
        "f = shard_map(lambda x: jax.lax.psum(x, 'data'), mesh=mesh, "
        "in_specs=P('data'), out_specs=P()); "
        "print(float(f(jnp.ones(8)).sum()))",
        timeout=240,
        env_extra={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    record("mesh", ok, detail if not ok else "8-device mesh psum executed")

    # Native loader (C++ build or documented fallback).
    ok, detail = _sub(
        "from tpuflow.data.tpf import _build_lib; "
        "lib = _build_lib(); "
        "print('native loader built' if lib is not None "
        "else 'memmap fallback (g++ unavailable)')",
        timeout=240,
    )
    record("native", ok, detail, required=False)

    # Optional deps.
    opt = []
    for mod, why in (
        ("h5py", ".h5 archives"),
        ("matplotlib", "figures"),
        ("tensorflow", "TensorBoard logging"),
    ):
        try:
            __import__(mod)
            opt.append(f"{mod} ok")
        except ImportError:
            opt.append(f"{mod} MISSING ({why} unavailable)")
    record("optional", True, "; ".join(opt), required=False)

    overall = all(c["ok"] for c in checks.values() if c["required"])
    return {"checks": checks, "ok": overall}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    probe_timeout, as_json = 110.0, False
    for a in argv:
        if a.startswith("--probe-timeout="):
            probe_timeout = float(a.split("=", 1)[1])
        elif a == "--json":
            as_json = True
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
    result = run_checks(probe_timeout=probe_timeout)
    if as_json:
        print(json.dumps(result))
    else:
        for name, c in result["checks"].items():
            status = "PASS" if c["ok"] else ("WARN" if not c["required"] else "FAIL")
            print(f"{status:4s} {name:9s} {c['detail']}")
        print("doctor:", "healthy" if result["ok"] else "NOT healthy")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
