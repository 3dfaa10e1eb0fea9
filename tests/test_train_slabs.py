"""Unit tests for the slab-training driver's operational logic
(tools/train_slabs.py): snapshot discovery, the metrics-stall watchdog, and
normal slab completion.  The watchdog is what turns tunnel wedges (lost
in-flight device requests) into bounded retries instead of a hung run."""
import json
import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import train_slabs as TS


def test_latest_snapshot_epoch(tmp_path):
    assert TS.latest_snapshot_epoch(tmp_path) == 0
    # prior without optimizer state does not count as resumable
    (tmp_path / "prior_20.npz").write_bytes(b"x")
    assert TS.latest_snapshot_epoch(tmp_path) == 0
    (tmp_path / "training_20.npz").write_bytes(b"x")
    assert TS.latest_snapshot_epoch(tmp_path) == 20
    (tmp_path / "prior_100.npz").write_bytes(b"x")
    (tmp_path / "training_100.npz").write_bytes(b"x")
    (tmp_path / "prior_75.npz").write_bytes(b"x")
    (tmp_path / "training_75.npz").write_bytes(b"x")
    assert TS.latest_snapshot_epoch(tmp_path) == 100
    # malformed names ignored
    (tmp_path / "prior_abc.npz").write_bytes(b"x")
    assert TS.latest_snapshot_epoch(tmp_path) == 100


def test_run_slab_watchdog_kills_stalled_child(tmp_path):
    """A child that never advances metrics.jsonl is killed and reported as
    -1 within ~the stall window, not waited on forever."""
    t0 = time.time()
    rc = TS.run_slab([sys.executable, "-c", "import time; time.sleep(600)"],
                     tmp_path, stall_s=3.0)
    assert rc == -1
    assert time.time() - t0 < 120   # one 20s wait round + margin, not 600


def test_run_slab_passes_through_normal_exit(tmp_path):
    rc = TS.run_slab([sys.executable, "-c", "print('done')"],
                     tmp_path, stall_s=30.0)
    assert rc == 0
    rc = TS.run_slab([sys.executable, "-c", "raise SystemExit(3)"],
                     tmp_path, stall_s=30.0)
    assert rc == 3


def test_run_slab_metrics_progress_resets_watchdog(tmp_path):
    """A child that keeps appending metrics rows survives a stall window
    several times its quiet period."""
    script = (
        "import time, pathlib, sys\n"
        f"p = pathlib.Path({str(tmp_path)!r}) / 'metrics.jsonl'\n"
        "for i in range(4):\n"
        "    p.open('a').write('{}\\n')\n"
        "    time.sleep(1.2)\n"
        "print('finished')\n")
    t0 = time.time()
    rc = TS.run_slab([sys.executable, "-c", script], tmp_path, stall_s=30.0)
    assert rc == 0
    assert time.time() - t0 >= 4 * 1.2 - 1
