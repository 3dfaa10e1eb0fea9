"""Summarize a trainer run's metrics.jsonl into a TRAINING_r{N}.json
artifact: throughput, the loss curve (downsampled), and a plateau check
(round-4 verdict item 3: self-trained-prior evidence at study scale needs
the training curve on record, reference network_trainer.py:40-219).

Usage: python tools/training_report.py <save_dir> [--out TRAINING_r04.json]
"""
import argparse
import json
from pathlib import Path

import numpy as np


def summarize(save_dir: str) -> dict:
    raw = [json.loads(ln) for ln in
           (Path(save_dir) / "metrics.jsonl").read_text().splitlines() if ln]
    assert raw, f"no metrics rows in {save_dir}"
    # latest-write-wins on the global iteration axis: an interrupted run's
    # tail (iterations past the snapshot a later invocation resumed from)
    # is superseded by the resumed run's re-coverage of the same span
    rows = []
    for r in raw:
        while rows and rows[-1]["it"] >= r["it"]:
            rows.pop()
        rows.append(r)
    its = np.array([r["it"] for r in rows])
    ts = np.array([r["t"] for r in rows])
    loss_keys = [k for k in rows[0]
                 if k not in ("epoch", "it", "lr_dec", "lr_enc", "t")]
    # wall-rate from per-row deltas (robust to resume gaps in `t` --
    # metrics.jsonl is append-mode across invocations)
    d_it = np.diff(its).astype(float)
    d_t = np.diff(ts)
    ok = (d_it > 0) & (d_t > 0)
    rate = (float(np.median(d_it[ok] / d_t[ok]))
            if ok.any() else None)
    total = {k: np.array([r[k] for r in rows]) for k in loss_keys}
    # downsampled curve: ~40 evenly spaced points per loss
    sel = np.unique(np.linspace(0, len(rows) - 1, 40).astype(int))
    curve = [{"it": int(its[i]), "epoch": rows[i]["epoch"],
              **{k: round(float(total[k][i]), 5) for k in loss_keys}}
             for i in sel]
    # plateau: relative change of the primary loss over the last 20% of its
    main = loss_keys[0]
    tail = total[main][its >= its[-1] * 0.8]
    head_of_tail = float(np.mean(tail[: max(len(tail) // 4, 1)]))
    end_of_tail = float(np.mean(tail[-max(len(tail) // 4, 1):]))
    rel_change = (end_of_tail - head_of_tail) / max(abs(head_of_tail), 1e-9)
    ckpts = sorted(int(p.stem.split("_")[1])
                   for p in Path(save_dir).glob("prior_*.npz"))
    return {
        "save_dir": str(save_dir),
        "epochs": int(rows[-1]["epoch"]),
        "total_its": int(its[-1]),
        "it_per_s": round(rate, 2) if rate else None,
        "final": {k: round(float(total[k][-1]), 5) for k in loss_keys},
        "plateau_rel_change_last20pct": round(float(rel_change), 4),
        "plateaued": bool(abs(rel_change) < 0.05),
        "checkpoints": ckpts,
        "curve": curve,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("--out", default="TRAINING_r04.json")
    args = ap.parse_args(argv)
    out = summarize(args.save_dir)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "curve"},
                     indent=2))


if __name__ == "__main__":
    main()
