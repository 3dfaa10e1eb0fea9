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

Usage:
    python tools/train_slabs.py configs/train-study-mixed.yaml \
        --target 300 --slab 25 [--resume-from auto]
"""
from __future__ import annotations

import argparse
import json
import re
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--target", type=int, default=None,
                    help="final epoch (default: the config's num_epochs)")
    ap.add_argument("--slab", type=int, default=25,
                    help="epochs per process (25 ~= 6k steps ~= 18 GB growth)")
    ap.add_argument("--resume-from", default="auto",
                    help="'auto' (latest snapshot in save_dir), or an epoch")
    ap.add_argument("--python", default=sys.executable)
    args = ap.parse_args()

    hyper = yaml.safe_load(open(args.config))
    target = args.target or int(hyper["num_epochs"])
    save_dir = Path(hyper.get("save_dir", f"./di-checkpoints/{hyper['run_name']}"))

    cur = latest_snapshot_epoch(save_dir) if args.resume_from == "auto" \
        else int(args.resume_from)
    print(f"[slabs] {args.config}: epoch {cur} -> {target} in slabs of {args.slab}",
          flush=True)

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
        r = subprocess.run(cmd)
        dt = time.time() - t0
        got = latest_snapshot_epoch(save_dir)
        print(f"[slabs] slab exit={r.returncode} after {dt / 60:.1f} min; "
              f"latest snapshot epoch {got}", flush=True)
        if got <= cur:
            print("[slabs] no forward progress -- aborting", flush=True)
            return 1
        cur = got
    print(f"[slabs] done: epoch {cur}", flush=True)
    # convenience: summary row for TRAINING_r*.json assembly
    print(json.dumps({"final_epoch": cur, "save_dir": str(save_dir)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
