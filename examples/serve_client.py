"""Minimal client for a running `tpuflow-serve http` endpoint.

Demonstrates the serving contract from the consumer side: numpy +
stdlib urllib ONLY — no tpuflow, no jax. The server (see
tpuflow/tools/serve.py, docs/OPERATIONS.md "Serving") owns the
compiled artifact; clients speak .npz over HTTP:

  GET  /healthz                      -> sidecar metadata JSON (the
                                        contract: lf_input_shape,
                                        normalization, calibration)
  POST /rollout?seed=..&calibrated=1 -> .npz body {"lf": (T,h,w,C)}
                                        in PHYSICAL units, response
                                        .npz {"mean","var"} (T,H,W,C)

Usage (server side, once per artifact):
    tpuflow-export backward-step            # writes rollout.jaxexport + sidecar
    tpuflow-serve http --artifact eval_out/backward-step/rollout.jaxexport

Then:
    python examples/serve_client.py [--url http://127.0.0.1:8421]
        [--lf trajectory.npz] [--seed 7] [--calibrated] [--out stats.npz]

Without --lf, a smooth synthetic LF trajectory matching the /healthz
contract shape is generated — enough to exercise the endpoint; real
use POSTs a coarse-solver export (docs/DATA_FORMAT.md).
"""

from __future__ import annotations

import argparse
import io
import json
import urllib.error
import urllib.request

import numpy as np


def fetch_contract(url: str) -> dict:
    with urllib.request.urlopen(f"{url}/healthz", timeout=60) as r:
        return json.loads(r.read())


def synthetic_lf(meta: dict, seed: int) -> np.ndarray:
    """A smooth random trajectory with the contract's shape and the
    dataset's physical-unit scale (sidecar lf_mean/lf_std)."""
    t, h, w, c = meta["lf_input_shape"]
    rng = np.random.default_rng(seed)
    # Low-frequency spatial pattern advected in time: a plausible
    # coarse-solver field, not white noise.
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    fields = []
    for k in range(c):
        kx, ky = rng.uniform(0.5, 2.0, size=2)
        phase = rng.uniform(0, 2 * np.pi)
        speed = rng.uniform(0.05, 0.2)
        tt = np.arange(t, dtype=np.float32)[:, None, None]
        fields.append(
            np.sin(
                2 * np.pi * (kx * x / w + ky * y / h) + phase + speed * tt
            )
        )
    z = np.stack(fields, axis=-1)  # (T, h, w, C), ~N(0, 1/sqrt(2))
    mean = np.asarray(meta["lf_mean"], dtype=np.float32)
    std = np.asarray(meta["lf_std"], dtype=np.float32)
    return (z * std * np.sqrt(2.0) + mean).astype(np.float32)


def load_lf(path: str) -> np.ndarray:
    """Same leniency as the server's payload decoder: .npy, or .npz
    with array "lf" or a single array under any name."""
    loaded = np.load(path, allow_pickle=False)
    if isinstance(loaded, np.ndarray):
        return loaded
    with loaded:
        if "lf" in loaded.files:
            return loaded["lf"]
        if len(loaded.files) == 1:
            return loaded[loaded.files[0]]
        raise SystemExit(
            f"ambiguous npz {path} with arrays {loaded.files}: "
            "name the trajectory 'lf'"
        )


def post_rollout(
    url: str, lf: np.ndarray, seed: int, calibrated: bool,
    temperature: float | None,
) -> dict:
    buf = io.BytesIO()
    np.savez(buf, lf=lf)
    query = f"seed={seed}"
    if calibrated:
        query += "&calibrated=1"
    if temperature is not None:
        query += f"&temperature={temperature}"
    req = urllib.request.Request(
        f"{url}/rollout?{query}", data=buf.getvalue(), method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            out = np.load(io.BytesIO(r.read()), allow_pickle=False)
            return {k: out[k] for k in out.files}
    except urllib.error.HTTPError as e:
        # 400 = contract violation (shape / calibration); body says what.
        raise SystemExit(f"server rejected request ({e.code}): "
                         f"{e.read().decode(errors='replace')}")


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--url", default="http://127.0.0.1:8421")
    p.add_argument("--lf", help=".npz/.npy LF trajectory (physical units); "
                   "omit for a synthetic one matching the contract")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--calibrated", action="store_true",
                   help="apply the fitted UQ recalibration riding the sidecar")
    p.add_argument("--out", default=None, help="save mean/var to this .npz")
    args = p.parse_args(argv)
    args.url = args.url.rstrip("/")  # the server matches paths exactly

    meta = fetch_contract(args.url)
    print(f"endpoint serves case={meta['case']}: "
          f"LF {tuple(meta['lf_input_shape'])} -> "
          f"{meta['rollout_steps']} steps x {meta['n_samples']} members, "
          f"default tau={meta['default_temperature']}")
    if args.calibrated and "spread_scale" not in meta:
        raise SystemExit("endpoint carries no fitted calibration "
                         "(case not evaluated before export)")

    if args.lf:
        lf = load_lf(args.lf)
    else:
        lf = synthetic_lf(meta, args.seed)
    out = post_rollout(args.url, lf, args.seed, args.calibrated,
                       args.temperature)

    mean, var = out["mean"], out["var"]
    print(f"mean {mean.shape} [{mean.min():.3g}, {mean.max():.3g}], "
          f"var {var.shape} [{var.min():.3g}, {var.max():.3g}] "
          f"(sigma ~ {np.sqrt(var.mean()):.3g})")
    if args.out:
        buf = io.BytesIO()
        np.savez(buf, **out)
        with open(args.out, "wb") as f:
            f.write(buf.getvalue())
        print(f"saved -> {args.out}")
    return out


if __name__ == "__main__":
    main()
