"""Training supervisor: stall-aware, auto-resuming long runs.

Parity: SURVEY.md §5 "Failure detection / elastic recovery" — the
reference's recovery contract is *resume from the last epoch
checkpoint, manually*. tpuflow's deterministic resume (Orbax state +
epoch-seeded data order) makes that automatic, and this supervisor
closes the loop: it runs training as a child process, watches a
progress heartbeat (the mtime of the run's ``train_log.csv``), and
kills + relaunches a run that stops making progress — the relaunch
resumes exactly from the latest checkpoint.

Why heartbeat, not liveness: remote accelerator clients can HANG
rather than error (observed in production through a tunneled TPU: the
process stays alive at idle CPU while no step ever completes), so
"the process is running" is not health — "the metrics file is
advancing" is. Crashes (nonzero exit) are restarted from checkpoint
the same way, with a bounded restart budget so a systematically
broken run fails loudly instead of looping forever.

Usage:
  python -m tpuflow.tools.supervise_train <case> [key=value ...] \
      [--stall-timeout=600] [--compile-grace=1500] [--max-restarts=5] \
      [--max-leg-seconds=0 (unbounded)]

Everything without a ``--`` prefix is passed through to
``tpuflow.cli.train`` unchanged (same case API).
"""

from __future__ import annotations

import dataclasses
import pathlib
import subprocess
import sys
import time


@dataclasses.dataclass
class SupervisorConfig:
    """Knobs, all in seconds unless noted.

    ``compile_grace`` is the allowance before the FIRST heartbeat of
    each attempt (XLA compile through a remote-compile helper has been
    measured at 400–900 s); ``stall_timeout`` applies after progress
    has been seen. ``max_leg_seconds`` (0 = unbounded) additionally
    bounds each attempt's wall clock, heartbeat or not.

    ``wedge_cooldown`` is slept before relaunching after a
    *no-first-heartbeat* stall — the signature of a wedged remote
    accelerator tunnel (child hangs at client init). A wedged tunnel
    needs quiet time with no client attached to recover (measured
    ~10 min in production); relaunching immediately re-wedges it, so
    the default cools down for 300 s. Crashes and post-progress
    stalls relaunch immediately as before.
    """

    stall_timeout: float = 600.0
    compile_grace: float = 1500.0
    max_restarts: int = 5
    poll_interval: float = 10.0
    max_leg_seconds: float = 0.0
    wedge_cooldown: float = 300.0


@dataclasses.dataclass
class SupervisorResult:
    exit_code: int
    restarts: int
    stalls: int
    crashes: int


def _heartbeat_mtime(path: pathlib.Path) -> float | None:
    try:
        return path.stat().st_mtime
    except OSError:
        return None


def _stop(proc: subprocess.Popen, log) -> None:
    proc.terminate()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        log("child ignored SIGTERM; killing")
        proc.kill()
        proc.wait()


def supervise(
    cmd: list[str],
    heartbeat: str | pathlib.Path,
    cfg: SupervisorConfig | None = None,
    log=None,
) -> SupervisorResult:
    """Run ``cmd`` under stall supervision until it exits 0 or the
    restart budget is spent.

    Args:
      cmd: child argv (e.g. ``[sys.executable, "-m",
        "tpuflow.cli.train", case, ...]``). The child must make
        progress visible by touching ``heartbeat``.
      heartbeat: file whose mtime advances while the child is healthy
        (the trainer's ``train_log.csv``).
      log: optional callable(str) for supervisor events (default:
        stderr with timestamps).

    Returns SupervisorResult; ``exit_code`` 0 means the child
    completed normally (possibly after restarts).
    """
    cfg = cfg or SupervisorConfig()
    hb = pathlib.Path(heartbeat)
    if log is None:
        def log(msg: str) -> None:
            print(
                f"[supervisor {time.strftime('%H:%M:%S')}] {msg}",
                file=sys.stderr,
                flush=True,
            )

    restarts = stalls = crashes = 0
    attempt = 0
    while True:
        attempt += 1
        start = time.monotonic()
        baseline = _heartbeat_mtime(hb)  # pre-existing file is not progress
        seen_progress = False
        log(f"attempt {attempt}: {' '.join(cmd)}")
        proc = subprocess.Popen(cmd)
        reason = None
        wedged = False
        while True:
            code = proc.poll()
            if code is not None:
                if code == 0:
                    log(f"child completed (attempt {attempt})")
                    return SupervisorResult(0, restarts, stalls, crashes)
                reason = f"crash (exit {code})"
                crashes += 1
                break
            now = time.monotonic()
            mtime = _heartbeat_mtime(hb)
            if mtime is not None and mtime != baseline:
                baseline = mtime
                seen_progress = True
                last_progress = now
            allowance = cfg.stall_timeout if seen_progress else cfg.compile_grace
            since = (now - last_progress) if seen_progress else (now - start)
            if since > allowance:
                reason = (
                    f"stall ({since:.0f}s without heartbeat on {hb.name}; "
                    f"{'post-progress' if seen_progress else 'no first heartbeat'})"
                )
                wedged = not seen_progress
                stalls += 1
                _stop(proc, log)
                break
            if cfg.max_leg_seconds and (now - start) > cfg.max_leg_seconds:
                reason = f"leg bound ({cfg.max_leg_seconds:.0f}s) reached"
                stalls += 1
                _stop(proc, log)
                break
            time.sleep(cfg.poll_interval)
        if restarts >= cfg.max_restarts:
            log(f"{reason}; restart budget spent ({cfg.max_restarts}) — giving up")
            if wedged:
                log("every attempt died without a first heartbeat — run "
                    "`tpuflow-doctor` to check whether the accelerator "
                    "tunnel is reachable at all")
            return SupervisorResult(1, restarts, stalls, crashes)
        restarts += 1
        log(f"{reason}; restarting from latest checkpoint "
            f"({restarts}/{cfg.max_restarts})")
        if wedged and cfg.wedge_cooldown > 0:
            log(f"no-first-heartbeat stall looks like a wedged tunnel; "
                f"cooling down {cfg.wedge_cooldown:.0f}s before relaunch")
            time.sleep(cfg.wedge_cooldown)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sup_kwargs: dict[str, float] = {}
    train_args: list[str] = []
    for a in argv:
        if a.startswith("--"):
            key, _, val = a[2:].partition("=")
            field = key.replace("-", "_")
            if field not in {f.name for f in dataclasses.fields(SupervisorConfig)}:
                raise SystemExit(f"unknown supervisor flag --{key}")
            sup_kwargs[field] = float(val)
        else:
            train_args.append(a)
    if not train_args:
        print(__doc__)
        return 2
    cfg = SupervisorConfig(**{
        k: (int(v) if k == "max_restarts" else v) for k, v in sup_kwargs.items()
    })

    from tpuflow.cli import parse_args

    case_cfg = parse_args(train_args)
    heartbeat = (
        pathlib.Path(case_cfg.train.checkpoint_dir)
        / case_cfg.name
        / "train_log.csv"
    )
    cmd = [sys.executable, "-m", "tpuflow.cli.train", *train_args]
    result = supervise(cmd, heartbeat, cfg)
    print(
        f"supervisor done: exit={result.exit_code} restarts={result.restarts} "
        f"stalls={result.stalls} crashes={result.crashes}"
    )
    return result.exit_code


if __name__ == "__main__":
    raise SystemExit(main())
