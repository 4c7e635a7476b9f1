"""Structured metrics logging.

Parity+: the reference logs via prints and loss-history arrays
(SURVEY.md §5 "Metrics / logging"); tpuflow upgrades to structured CSV
rows (one file per run) plus stdout lines — and, when a
``tensorboard_dir`` is given, TensorBoard scalar summaries — feeding
the same quantities the reference tracks (NLL bits/dim, grad norm) and
the north-star throughput counters (steps/sec/chip).
"""

from __future__ import annotations

import csv
import pathlib
import sys
import time
from typing import Any


class MetricsLogger:
    """Append-only CSV + stdout metrics stream, optional TensorBoard."""

    def __init__(
        self,
        path: str | pathlib.Path | None = None,
        quiet: bool = False,
        tensorboard_dir: str | pathlib.Path | None = None,
    ):
        self._path = pathlib.Path(path) if path else None
        self._file = None
        self._writer = None
        self._fields: list[str] | None = None
        self._quiet = quiet
        self._warned_fields: set = set()
        self._t0 = time.time()
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf  # baked into this image

                self._tb = tf.summary.create_file_writer(str(tensorboard_dir))
            except ImportError:
                print(
                    "tensorboard_dir set but tensorflow unavailable; "
                    "TensorBoard logging disabled", file=sys.stderr,
                )

    def log(self, step: int, **metrics: Any) -> None:
        row = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        row.update({k: _scalar(v) for k, v in metrics.items()})
        if self._path:
            if self._writer is None:
                self._path.parent.mkdir(parents=True, exist_ok=True)
                self._file = open(self._path, "a", newline="")
                self._fields = list(row)
                self._writer = csv.DictWriter(self._file, fieldnames=self._fields)
                if self._file.tell() == 0:
                    self._writer.writeheader()
            extra = set(row) - set(self._fields)
            if extra and extra - self._warned_fields:
                # The CSV schema is frozen at the first row (appending a
                # column mid-file would corrupt it); don't silently drop
                # late-appearing metrics.
                self._warned_fields |= extra
                print(
                    f"MetricsLogger: dropping {sorted(extra)} from CSV "
                    "(schema frozen at first row; stdout/TensorBoard "
                    "still carry them)", file=sys.stderr,
                )
            self._writer.writerow({k: row.get(k, "") for k in self._fields})
            self._file.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for k, v in row.items():
                    if k != "step" and isinstance(v, float):
                        tf.summary.scalar(k, v, step=step)
        if not self._quiet:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()
            )
            print(parts, file=sys.stdout, flush=True)

    def touch(self) -> None:
        """Advance the CSV file's mtime without writing a row. The
        training supervisor uses that mtime as the liveness heartbeat;
        healthy-but-rowless phases (e.g. the first compile of the
        periodic validation step) call this so they are not mistaken
        for a wedged run."""
        if self._path and self._path.exists():
            import os

            os.utime(self._path)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


def _scalar(v: Any):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
