"""Profile the flagship ensemble rollout: capture a jax.profiler trace
and print the top device-time consumers per HLO op.

VERDICT.md r1 item 1 asked for a named top-3 device-time breakdown of
the 64-member rollout before attacking it; this tool produces that
breakdown on any backend (TPU via the axon tunnel, or CPU) without
needing a TensorBoard server: it parses the captured ``.xplane.pb``
directly (the tensorboard_plugin_profile converter in this image is
version-skewed against TF, so we read the XSpace proto ourselves).

Usage:
  python -m tpuflow.tools.profile_rollout <case> [key=value ...] \
      [steps=20] [out=/tmp/tpuflow_profile]

Prints a table of {op name, category, total ms, %} aggregated over the
device plane's "XLA Ops" lines, plus the grouped per-module summary,
and writes the raw table to <out>/op_times.json.
"""

from __future__ import annotations

import collections
import gzip
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _load_xspace(path: pathlib.Path):
    """Parse one .xplane.pb file into an XSpace proto (via TF's bundled
    tsl proto; pure-python protobuf impl to dodge descriptor skew)."""
    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    data = path.read_bytes()
    if path.suffix == ".gz":
        data = gzip.decompress(data)
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)
    return space


def op_times_from_trace(trace_dir: str | pathlib.Path) -> list[dict]:
    """Aggregate device-plane op durations from the newest trace run.

    Returns rows {name, category, total_ms, count} sorted by total_ms
    descending. Only device planes (TPU/GPU/CPU XLA) are read; host
    python/runtime lines are skipped.
    """
    root = pathlib.Path(trace_dir)
    pbs = sorted(root.rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not pbs:
        raise FileNotFoundError(f"no .xplane.pb under {root}")
    space = _load_xspace(pbs[-1])

    rows: dict[tuple[str, str], dict] = {}
    for plane in space.planes:
        # Device planes: "/device:TPU:0" / "TPU:0" / "/device:CPU:0 (XLA)"...
        name_l = plane.name.lower()
        if not ("tpu" in name_l or "gpu" in name_l or "xla" in name_l):
            continue
        if "host" in name_l and "tpu" not in name_l:
            continue
        stat_md = plane.stat_metadata
        for line in plane.lines:
            # Op-level lines only; skip step/module envelope lines
            # (they'd double-count their children).
            lname = line.name.lower()
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                name = md.display_name or md.name
                cat = ""
                for st in list(ev.stats) + list(md.stats):
                    smd = stat_md.get(st.metadata_id)
                    if smd is not None and smd.name in (
                        "hlo_category", "category", "tf_op",
                    ):
                        which = st.WhichOneof("value")
                        if which == "str_value":
                            cat = st.str_value
                        elif which == "ref_value":
                            cat = stat_md[st.ref_value].name
                        if smd.name == "hlo_category":
                            break
                if cat in ("while", "conditional", "call"):
                    # Control-flow envelope events cover their children
                    # (the scan body's ops are separate events) —
                    # keeping them would double-count device time.
                    continue
                key = (name, cat)
                r = rows.setdefault(
                    key,
                    {"name": name, "category": cat, "total_ms": 0.0,
                     "count": 0},
                )
                r["total_ms"] += ev.duration_ps / 1e9
                r["count"] += 1
    out = sorted(rows.values(), key=lambda r: -r["total_ms"])
    return out


def group_by_category(rows: list[dict]) -> list[dict]:
    agg = collections.defaultdict(float)
    for r in rows:
        agg[r["category"] or "(none)"] += r["total_ms"]
    total = sum(agg.values()) or 1.0
    return [
        {"category": c, "total_ms": round(v, 3), "pct": round(100 * v / total, 1)}
        for c, v in sorted(agg.items(), key=lambda kv: -kv[1])
    ]


def print_report(rows: list[dict], top: int = 30) -> None:
    total = sum(r["total_ms"] for r in rows) or 1.0
    print(f"\n== device op time: {total:.1f} ms total ==")
    print(f"{'ms':>9} {'%':>5} {'count':>6}  name  [category]")
    for r in rows[:top]:
        print(
            f"{r['total_ms']:9.2f} {100 * r['total_ms'] / total:5.1f} "
            f"{r['count']:6d}  {r['name'][:90]}  [{r['category']}]"
        )
    print("\n== by category ==")
    for g in group_by_category(rows):
        print(f"{g['total_ms']:9.2f} {g['pct']:5.1f}  {g['category']}")


def main(argv=None) -> list[dict]:
    argv = list(sys.argv[1:] if argv is None else argv)
    steps = 20
    out_dir = "/tmp/tpuflow_profile"
    rest = []
    for a in argv:
        if a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        else:
            rest.append(a)

    from tpuflow.cli import parse_args
    from tpuflow.data import generate_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow, init_lstm_state
    from tpuflow.utils.profiling import force_completion, trace_context

    cfg = parse_args(rest or ["backward-step"])
    model = TMGlow(cfg.model)
    n = cfg.eval.n_samples
    lf, hf = generate_case(
        cfg.data.case, 1, max(2, steps), cfg.model.hf_shape,
        cfg.model.lf_shape, seed=0,
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]),
        state,
    )
    rollout = jax.jit(
        make_ensemble_rollout(model, n, cfg.eval.temperature, "stats")
    )
    lf_traj = jnp.asarray(lf[0, :steps])

    t0 = time.time()
    force_completion(rollout(variables, lf_traj, jax.random.PRNGKey(0)))
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    force_completion(rollout(variables, lf_traj, jax.random.PRNGKey(1)))
    wall = time.time() - t0
    print(
        f"# steady-state: {wall:.3f}s for {steps} steps "
        f"({steps / wall:.1f} steps/s, {n} members)",
        file=sys.stderr,
    )

    with trace_context(out_dir):
        force_completion(rollout(variables, lf_traj, jax.random.PRNGKey(2)))

    rows = op_times_from_trace(out_dir)
    print_report(rows)
    p = pathlib.Path(out_dir) / "op_times.json"
    p.write_text(json.dumps(rows, indent=1))
    print(f"\n# wrote {p}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
