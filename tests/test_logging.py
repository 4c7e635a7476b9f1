"""MetricsLogger tests: CSV rows, optional TensorBoard summaries
(SURVEY.md §5 metrics row)."""

import csv

import pytest

from tpuflow.utils.logging import MetricsLogger


def test_csv_rows(tmp_path):
    p = tmp_path / "log.csv"
    lg = MetricsLogger(p, quiet=True)
    lg.log(1, bpd=2.5, grad_norm=0.1)
    lg.log(2, bpd=2.0, grad_norm=0.2)
    lg.close()
    rows = list(csv.DictReader(open(p)))
    assert len(rows) == 2
    assert float(rows[1]["bpd"]) == 2.0
    assert set(rows[0]) >= {"step", "wall_s", "bpd", "grad_norm"}


def test_tensorboard_summaries(tmp_path):
    tf = pytest.importorskip("tensorflow")
    tb = tmp_path / "tb"
    lg = MetricsLogger(quiet=True, tensorboard_dir=tb)
    lg.log(1, bpd=2.5)
    lg.log(2, bpd=2.0)
    lg.close()
    events = list(tb.glob("events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    vals = {}
    for e in tf.compat.v1.train.summary_iterator(str(events[0])):
        for v in e.summary.value:
            if v.tag == "bpd":
                vals[e.step] = float(tf.make_ndarray(v.tensor))
    assert vals == {1: 2.5, 2: 2.0}


def test_logger_touch_advances_mtime(tmp_path):
    """touch() bumps the CSV mtime (the supervisor heartbeat) without
    adding rows; no-ops safely with no path or before the first row."""
    import os
    import time

    from tpuflow.utils.logging import MetricsLogger

    MetricsLogger(quiet=True).touch()  # stdout-only logger: no-op

    p = tmp_path / "train_log.csv"
    lg = MetricsLogger(p, quiet=True)
    lg.touch()  # file not created yet: no-op
    lg.log(1, bpd=2.0)
    old = os.stat(p)
    os.utime(p, (old.st_atime, old.st_mtime - 100))
    before = os.stat(p).st_mtime
    lg.touch()
    assert os.stat(p).st_mtime > before
    with open(p) as f:
        assert len(f.readlines()) == 2  # header + one row, no extras
    lg.close()
