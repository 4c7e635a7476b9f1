"""Archive inspector: summarize + contract-check a trajectory archive.

Parity context: SURVEY.md §7 ranks "dataset format archaeology" among
the hard parts — the reference's Zenodo layout was unverifiable
offline, so tpuflow publishes its own contract (docs/DATA_FORMAT.md)
and this tool is the first thing to run against any newly obtained
archive: it prints what the file actually contains and exactly which
contract clause fails, instead of a stack trace three layers into
training.

Usage:
  python -m tpuflow.tools.inspect_data <archive.{h5|hdf5|npz|tpf}>
      [--n-scales=3] [--json]

Checks (docs/DATA_FORMAT.md):
  - datasets lf/hf, 5-D (N, T, h, w, C), aligned (N, T), C == 3
  - H, W divisible by 2**n_scales (Glow squeeze wiring)
  - finite values (NaN/Inf counts per field)
Reports per-channel physical stats and the per-channel LF↔HF
correlation on pooled LF-grid fields (synthetic fixtures sit >0.9;
a near-zero value usually means mis-paired or mis-ordered datasets).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

_CHANNELS = ("u", "v", "p")


def _pool_to(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """Mean-pool (..., H, W, C) onto an (h, w) grid for LF comparison."""
    H, W = a.shape[-3], a.shape[-2]
    if H % h or W % w:  # fall back to stride sampling on ragged ratios
        return a[..., :: max(H // h, 1), :: max(W // w, 1), :][..., :h, :w, :]
    return a.reshape(*a.shape[:-3], h, H // h, w, W // w, a.shape[-1]).mean(
        axis=(-4, -2)
    )


def inspect_archive(path: str | pathlib.Path, n_scales: int = 3) -> dict:
    """Return the inspection record (also the --json output)."""
    from tpuflow.data.dataset import load_archive

    path = pathlib.Path(path)
    lf, hf = load_archive(path)
    rec: dict = {
        "path": str(path),
        "lf_shape": list(lf.shape),
        "hf_shape": list(hf.shape),
        "dtype": {"lf": str(lf.dtype), "hf": str(hf.dtype)},
        "errors": [],
        "warnings": [],
    }

    if lf.ndim != 5 or hf.ndim != 5:
        rec["errors"].append(
            f"lf/hf must be 5-D (N, T, h, w, C); got lf {lf.shape}, hf {hf.shape}"
        )
        rec["ok"] = False
        return rec
    if lf.size == 0 or hf.size == 0:
        rec["errors"].append(
            f"empty archive: lf {lf.shape}, hf {hf.shape} contain no data"
        )
        rec["ok"] = False
        return rec
    if lf.shape[:2] != hf.shape[:2]:
        rec["errors"].append(
            f"(N, T) misaligned: lf {lf.shape[:2]} vs hf {hf.shape[:2]}"
        )
    if lf.shape[-1] != hf.shape[-1]:
        rec["errors"].append(
            f"channel mismatch: lf C={lf.shape[-1]} vs hf C={hf.shape[-1]}"
        )
    if hf.shape[-1] != len(_CHANNELS):
        rec["warnings"].append(
            f"C={hf.shape[-1]} (contract orders channels (u, v, p); C=3)"
        )
    H, W = hf.shape[2], hf.shape[3]
    div = 2**n_scales
    if H % div or W % div:
        rec["errors"].append(
            f"HF grid {H}x{W} not divisible by 2**n_scales={div} "
            f"(Glow squeeze wiring)"
        )

    for name, a in (("lf", lf), ("hf", hf)):
        bad = int(np.size(a) - np.isfinite(a).sum())
        if bad:
            rec["errors"].append(f"{name} has {bad} non-finite values")
        rec[f"{name}_channels"] = {
            (_CHANNELS[c] if c < len(_CHANNELS) else f"c{c}"): {
                "mean": float(a[..., c].mean()),
                "std": float(a[..., c].std()),
                "min": float(a[..., c].min()),
                "max": float(a[..., c].max()),
            }
            for c in range(a.shape[-1])
        }

    # LF<->HF pairing sanity: pooled-HF vs LF per-channel correlation.
    if hf.shape[2] < lf.shape[2] or hf.shape[3] < lf.shape[3]:
        rec["warnings"].append(
            f"HF grid {hf.shape[2]}x{hf.shape[3]} is SMALLER than the LF "
            f"grid {lf.shape[2]}x{lf.shape[3]} — lf/hf datasets are likely "
            "swapped (contract: hf is the fine grid)"
        )
    elif not rec["errors"]:
        pooled = _pool_to(hf, lf.shape[2], lf.shape[3])
        corr = {}
        for c in range(lf.shape[-1]):
            x = lf[..., c].ravel().astype(np.float64)
            y = pooled[..., c].ravel().astype(np.float64)
            sx, sy = x.std(), y.std()
            corr[_CHANNELS[c] if c < len(_CHANNELS) else f"c{c}"] = (
                float(((x - x.mean()) * (y - y.mean())).mean() / (sx * sy))
                if sx > 0 and sy > 0
                else 0.0
            )
        rec["lf_hf_correlation"] = corr
        if max(corr.values()) < 0.2:
            rec["warnings"].append(
                "LF<->HF correlation near zero on every channel — datasets "
                "may be mis-paired or channel order may differ from (u, v, p)"
            )

    rec["ok"] = not rec["errors"]
    return rec


def _fmt(rec: dict) -> str:
    lines = [f"archive: {rec['path']}"]
    lines.append(
        f"  lf {tuple(rec['lf_shape'])} {rec['dtype']['lf']}   "
        f"hf {tuple(rec['hf_shape'])} {rec['dtype']['hf']}"
    )
    for name in ("lf", "hf"):
        ch = rec.get(f"{name}_channels")
        if ch:
            for cname, s in ch.items():
                lines.append(
                    f"  {name}.{cname}: mean {s['mean']:+.4g}  std {s['std']:.4g}"
                    f"  range [{s['min']:.4g}, {s['max']:.4g}]"
                )
    if "lf_hf_correlation" in rec:
        c = rec["lf_hf_correlation"]
        lines.append(
            "  lf<->hf corr: "
            + "  ".join(f"{k}={v:+.3f}" for k, v in c.items())
        )
    for w in rec["warnings"]:
        lines.append(f"  WARNING: {w}")
    for e in rec["errors"]:
        lines.append(f"  ERROR: {e}")
    lines.append("  contract: " + ("OK" if rec["ok"] else "VIOLATED"))
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n_scales, as_json, paths = 3, False, []
    for a in argv:
        if a.startswith("--n-scales="):
            n_scales = int(a.split("=", 1)[1])
        elif a == "--json":
            as_json = True
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
        else:
            paths.append(a)
    if not paths:
        print(__doc__)
        return 2
    ok = True
    for p in paths:
        rec = inspect_archive(p, n_scales=n_scales)
        print(json.dumps(rec) if as_json else _fmt(rec))
        ok = ok and rec["ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
