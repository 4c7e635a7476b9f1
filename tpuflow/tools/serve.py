"""Serve an exported rollout artifact: batch files or an HTTP endpoint.

The production consumer of `tools/export_rollout.py` (SURVEY.md §3.2 is
the reference's inference path; the reference ships only per-case test
scripts — this is the parity+ serving tier). The server needs ONLY the
artifact + its sidecar `rollout.meta.json`: no tpuflow model code, no
Flax, no checkpoint — `jax.export` deserialization rebuilds the whole
compiled rollout, and the sidecar carries the LF normalization
constants so requests arrive in PHYSICAL units.

Two modes:

  batch  — one-shot file → file:
      python -m tpuflow.tools.serve batch --artifact rollout.jaxexport \\
          --input lf.npz --output stats.npz [--seed 0] [--temperature t] \\
          [--normalized]
      Input: .npz with array "lf" (or a single unnamed array / .npy) of
      shape (T, h, w, C) in physical units (pass --normalized if it is
      already normalized). Output: .npz with physical-unit "mean" and
      "var" of shape (T, H, W, C).

  http   — stdlib ThreadingHTTPServer:
      python -m tpuflow.tools.serve http --artifact rollout.jaxexport \\
          [--host 127.0.0.1] [--port 8421]
      POST /rollout?seed=0&temperature=0.7[&normalized=1][&calibrated=1]
      with an .npz body → .npz response ("mean", "var"). GET /healthz →
      sidecar metadata JSON. Calls are serialized through a lock: one
      accelerator, one compiled program, deterministic latency.

If the case was evaluated before export, the sidecar carries the
fitted UQ recalibration (eval/calibrate) and `--calibrated` /
`?calibrated=1` returns spread-inflated variances (var × s²); the
per-level `interval_scales` ride along in /healthz for clients building
central intervals from the two-moment outputs.

Device placement follows the process' JAX default (the artifact is
lowered for both TPU and CPU by default, so the same file serves
on-chip and in CPU fallback).
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import threading

import numpy as np


class RolloutServer:
    """A loaded artifact + sidecar, exposing physical-unit rollout."""

    def __init__(self, artifact_path: str | pathlib.Path, meta_path=None):
        # Leaf import: the serving host needs jax + numpy only, not the
        # model/data/training stack (tools/artifact.py docstring).
        from tpuflow.tools.artifact import load_artifact

        artifact_path = pathlib.Path(artifact_path)
        self.fn = load_artifact(artifact_path)
        meta_path = (
            pathlib.Path(meta_path)
            if meta_path
            else artifact_path.with_suffix(".meta.json")
        )
        if not meta_path.exists():
            raise FileNotFoundError(
                f"sidecar {meta_path} not found — re-run "
                "tools/export_rollout.py (it writes rollout.meta.json "
                "next to the artifact) or pass --meta explicitly"
            )
        self.meta = json.loads(meta_path.read_text())
        self._lf_mean = np.asarray(self.meta["lf_mean"], dtype=np.float32)
        self._lf_std = np.asarray(self.meta["lf_std"], dtype=np.float32)
        self._lock = threading.Lock()

    def rollout(
        self, lf, seed=0, temperature=None, normalized=False,
        calibrated=False,
    ):
        """Physical-unit LF trajectory -> {"mean", "var"} numpy dict.

        ``calibrated=True`` additionally applies the fitted UQ
        recalibration carried in the sidecar (mean-preserving spread
        inflation, var * spread_scale^2 — eval/calibrate semantics);
        raises ValueError if the artifact was exported before the case
        was evaluated (no fitted factor to apply).
        """
        lf = np.asarray(lf, dtype=np.float32)
        want = tuple(self.meta["lf_input_shape"])
        if lf.shape != want:
            raise ValueError(
                f"LF input shape {lf.shape} != exported contract {want} "
                "(the artifact is compiled for a fixed trajectory shape)"
            )
        if not normalized:
            lf = (lf - self._lf_mean) / self._lf_std
        tau = (
            self.meta["default_temperature"]
            if temperature is None
            else temperature
        )
        # Wrap, don't reject: np.uint32(-1) raises OverflowError on
        # NumPy 2.x, long after the model loaded; any int is a seed.
        seed = int(seed) % (1 << 32)
        if calibrated and "spread_scale" not in self.meta:
            raise ValueError(
                "calibrated rollout requested but the sidecar carries no "
                "spread_scale — evaluate the case, then re-export (the "
                "exporter picks the fitted factors up from "
                "eval_metrics.json)"
            )
        if "n_scales" in self.meta:
            # Per-scale artifact contract (post-r4 exports): broadcast
            # scalar requests to the (n_scales,) tau vector.
            tau_v = np.asarray(tau, np.float32).reshape(-1)
            if tau_v.size == 1:
                tau_v = np.full(
                    (int(self.meta["n_scales"]),), tau_v[0], np.float32
                )
            tau_arg = tau_v
        else:  # pre-r4 scalar-tau artifact
            tau_arg = np.float32(float(np.asarray(tau).reshape(-1)[0]))
        with self._lock:
            out = self.fn.call(lf, np.uint32(seed), tau_arg)
        out = {k: np.asarray(v) for k, v in out.items()}
        if calibrated:
            out["var"] = out["var"] * np.float32(self.meta["spread_scale"]) ** 2
        return out


def _read_lf(data: bytes) -> np.ndarray:
    """Decode an .npz (array "lf" or the single array) or .npy payload
    (np.load detects which from the magic bytes)."""
    loaded = np.load(io.BytesIO(data), allow_pickle=False)
    if isinstance(loaded, np.ndarray):  # .npy content
        return loaded
    with loaded:
        if "lf" in loaded.files:
            return loaded["lf"]
        if len(loaded.files) == 1:
            return loaded[loaded.files[0]]
        raise ValueError(
            f"ambiguous npz payload {loaded.files}: name the array 'lf'"
        )


def _pack_npz(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def run_batch(args) -> pathlib.Path:
    server = RolloutServer(args.artifact, args.meta)
    lf = _read_lf(pathlib.Path(args.input).read_bytes())
    out = server.rollout(
        lf, seed=args.seed, temperature=args.temperature,
        normalized=args.normalized, calibrated=args.calibrated,
    )
    out_path = pathlib.Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(_pack_npz(out))
    print(
        f"rollout {server.meta['rollout_steps']} steps x "
        f"{server.meta['n_samples']} members -> {out_path} "
        f"(mean/var {out['mean'].shape})"
    )
    return out_path


def make_http_server(server: RolloutServer, host: str, port: int):
    """Build (not start) the HTTP server — separable for tests."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                body = json.dumps(server.meta).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            parsed = urlparse(self.path)
            if parsed.path != "/rollout":
                self._send(404, b"not found", "text/plain")
                return
            q = parse_qs(parsed.query)
            try:
                n = int(self.headers.get("Content-Length", 0))
                lf = _read_lf(self.rfile.read(n))
            except Exception as e:  # undecodable payload = client error
                self._send(400, str(e).encode(), "text/plain")
                return
            try:
                out = server.rollout(
                    lf,
                    seed=int(q.get("seed", ["0"])[0]),
                    temperature=(
                        float(q["temperature"][0]) if "temperature" in q
                        else None
                    ),
                    normalized=q.get("normalized", ["0"])[0]
                    in ("1", "true"),
                    calibrated=q.get("calibrated", ["0"])[0]
                    in ("1", "true"),
                )
            except ValueError as e:  # contract violation = client error
                self._send(400, str(e).encode(), "text/plain")
                return
            except Exception as e:  # runtime fault = server error; keep serving
                self._send(500, str(e).encode(), "text/plain")
                return
            self._send(200, _pack_npz(out), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def run_http(args):
    server = RolloutServer(args.artifact, args.meta)
    httpd = make_http_server(server, args.host, args.port)
    print(
        f"serving {server.meta['case']} rollout on "
        f"http://{args.host}:{httpd.server_address[1]} "
        "(POST /rollout, GET /healthz)"
    )
    httpd.serve_forever()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tpuflow-serve", description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    def common(sp):
        sp.add_argument("--artifact", required=True)
        sp.add_argument("--meta", default=None)

    b = sub.add_parser("batch", help="one-shot file -> file rollout")
    common(b)
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("--temperature", type=float, default=None)
    b.add_argument(
        "--normalized", action="store_true",
        help="input is already normalized (skip the sidecar constants)",
    )
    b.add_argument(
        "--calibrated", action="store_true",
        help="apply the sidecar's fitted UQ recalibration "
        "(var x spread_scale^2)",
    )

    h = sub.add_parser("http", help="HTTP rollout endpoint")
    common(h)
    h.add_argument("--host", default="127.0.0.1")
    h.add_argument("--port", type=int, default=8421)
    return p


def main(argv=None) -> None:
    # Honour TPUFLOW_PLATFORM=cpu|tpu before the first jax use (a
    # serving host may want CPU even where a TPU plugin is
    # force-registered; the JAX_PLATFORMS env var alone cannot
    # override such a plugin, jax.config.update can). Inlined from
    # tpuflow.cli so the serving host imports no CLI/config machinery.
    import os

    plat = os.environ.get("TPUFLOW_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    if args.mode == "batch":
        run_batch(args)
    else:
        run_http(args)


if __name__ == "__main__":
    main()
