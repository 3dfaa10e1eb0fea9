#!/usr/bin/env python
"""Run a training config to its target epoch in bounded process slabs.

Why this exists: on the tunnel TPU host the training process grows ~3 MB per
optimization step regardless of our own allocation discipline (the growth
matches the per-step upload size and survives after the loader was made
file-backed, pointing at the in-process device-client journal, which we do
not control).  A 300-epoch study run is ~73k steps -> ~220 GB, which the
kernel OOM-kills around epoch 130 on the 125 GB box (dmesg, 2026-08-20).
The trainer already checkpoints optimizer state and resumes at epoch
granularity (difusion_tpu/train/trainer.py:285-294), so the robust fix is
operational: run K epochs per process, exit, resume in a fresh process.
The packed-loader disk cache (lif_dataset.py PackedLifDataset) makes each
restart cheap (mmap load, no npz re-read).

The driver also carries a WEDGE WATCHDOG: the device tunnel intermittently
loses in-flight requests (idle compile service + a client blocked forever on
its first device op -- see the axon-tunnel-wedge triage note).  A slab that
produces no metrics-row progress for --stall-min minutes is killed, the
tunnel is re-probed with short timeout-bounded ops until one succeeds, and
the same slab is retried; epoch-level resume makes the retry lose at most
the slab in flight.

Usage:
    python tools/train_slabs.py configs/train-study-mixed.yaml \
        --target 300 --slab 25 [--resume-from auto] [--stall-min 12]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

import yaml


def latest_snapshot_epoch(save_dir: Path) -> int:
    best = 0
    for p in save_dir.glob("prior_*.npz"):
        m = re.match(r"prior_(\d+)\.npz$", p.name)
        if m and (save_dir / f"training_{m.group(1)}.npz").exists():
            best = max(best, int(m.group(1)))
    return best


def metrics_progress(save_dir: Path) -> float:
    """mtime of metrics.jsonl (0 if absent) -- the liveness signal."""
    p = save_dir / "metrics.jsonl"
    try:
        return p.stat().st_mtime
    except OSError:
        return 0.0


def tunnel_healthy(python: str, timeout_s: int = 60) -> bool:
    """One tiny device round trip with a hard timeout."""
    code = ("import jax, numpy as np;"
            "np.asarray(jax.numpy.ones((8,128))*2); print('ok')")
    try:
        r = subprocess.run([python, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(python: str, poll_s: int = 120) -> None:
    n = 0
    while not tunnel_healthy(python):
        n += 1
        print(f"[slabs] tunnel wedged; re-probe #{n} in {poll_s}s", flush=True)
        time.sleep(poll_s)
    print("[slabs] tunnel healthy", flush=True)


def run_slab(cmd, save_dir: Path, stall_s: float) -> int:
    """Run one trainer process; kill it if metrics stall for stall_s.
    Returns the exit code, or -1 on watchdog kill."""
    t_start = time.time()
    child = subprocess.Popen(cmd, start_new_session=True)
    last = metrics_progress(save_dir)
    last_t = time.time()
    while True:
        try:
            rc = child.wait(timeout=20)
            return rc
        except subprocess.TimeoutExpired:
            pass
        m = metrics_progress(save_dir)
        now = time.time()
        if m > last:
            last, last_t = m, now
        # last_t starts at spawn time, so the first window also covers
        # compile; after that it is time-since-last-new-metrics-row
        if now - last_t > stall_s:
            print(f"[slabs] watchdog: no metrics progress for "
                  f"{stall_s / 60:.0f} min -- killing slab", flush=True)
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                child.kill()
            child.wait()
            return -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--target", type=int, default=None,
                    help="final epoch (default: the config's num_epochs)")
    ap.add_argument("--slab", type=int, default=25,
                    help="epochs per process (25 ~= 6k steps ~= 18 GB growth)")
    ap.add_argument("--resume-from", default="auto",
                    help="'auto' (latest snapshot in save_dir), or an epoch")
    ap.add_argument("--stall-min", type=float, default=12.0,
                    help="kill a slab after this many minutes without a new "
                         "metrics row (covers worst-case cold compile)")
    ap.add_argument("--max-retries", type=int, default=30,
                    help="total watchdog kills tolerated before giving up")
    ap.add_argument("--python", default=sys.executable)
    args = ap.parse_args()

    hyper = yaml.safe_load(open(args.config))
    target = args.target or int(hyper["num_epochs"])
    save_dir = Path(hyper.get("save_dir", f"./di-checkpoints/{hyper['run_name']}"))

    cur = latest_snapshot_epoch(save_dir) if args.resume_from == "auto" \
        else int(args.resume_from)
    print(f"[slabs] {args.config}: epoch {cur} -> {target} in slabs of {args.slab}",
          flush=True)

    retries = 0
    wait_for_tunnel(args.python)    # don't burn a watchdog cycle on a wedge
    while cur < target:
        end = min(cur + args.slab, target)
        # every slab boundary must be a snapshot epoch so the next slab can
        # resume; keep the config's own snapshot schedule on top
        extra = sorted(set(list(hyper.get("additional_snapshots", [])) + [end]))
        cmd = [args.python, "-m", "difusion_tpu.train.trainer", args.config,
               "--set", f"resume_epoch={cur}",
               "--set", f"num_epochs={end}",
               "--set", f"additional_snapshots={extra}"]
        print(f"[slabs] epochs {cur + 1}..{end}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = run_slab(cmd, save_dir, args.stall_min * 60.0)
        dt = time.time() - t0
        got = latest_snapshot_epoch(save_dir)
        print(f"[slabs] slab exit={rc} after {dt / 60:.1f} min; "
              f"latest snapshot epoch {got}", flush=True)
        if got <= cur:
            retries += 1
            if retries > args.max_retries:
                print("[slabs] retry budget exhausted -- aborting", flush=True)
                return 1
            print(f"[slabs] no forward progress (retry {retries}/"
                  f"{args.max_retries}); waiting for tunnel", flush=True)
            wait_for_tunnel(args.python)
        cur = got
    print(f"[slabs] done: epoch {cur}", flush=True)
    # convenience: summary row for TRAINING_r*.json assembly
    print(json.dumps({"final_epoch": cur, "save_dir": str(save_dir)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
