"""Plot prior-training loss curves from a run's ``metrics.jsonl``.

The reference streams scalars to tensorboardX (network_trainer.py:18-33);
this build writes one JSON row per log interval instead, and this tool turns
them into curves.

Usage: python tools/plot_training.py <save_dir or metrics.jsonl> [--save out.png]
"""
import argparse
import json
from pathlib import Path

import numpy as np


def load_metrics(path: str):
    p = Path(path)
    if p.is_dir():
        p = p / "metrics.jsonl"
    rows = [json.loads(line) for line in p.read_text().splitlines() if line]
    if not rows:
        raise SystemExit(f"{p}: no metrics rows")
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("run", help="trainer save_dir or metrics.jsonl")
    parser.add_argument("--save", default="", help="write PNG instead of showing")
    parser.add_argument("--ewma", type=float, default=0.9,
                        help="smoothing factor for the overlay curve")
    args = parser.parse_args(argv)

    rows = load_metrics(args.run)
    its = np.array([r["it"] for r in rows])
    loss_keys = [k for k in rows[0]
                 if k not in ("epoch", "it", "t", "lr_dec", "lr_enc")]

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(loss_keys) + 1
    cols = min(n, 3)
    fig, axes = plt.subplots((n + cols - 1) // cols, cols,
                             figsize=(5 * cols, 3.5 * ((n + cols - 1) // cols)),
                             squeeze=False)
    flat = axes.ravel()
    for ax, key in zip(flat, loss_keys):
        y = np.array([r.get(key, np.nan) for r in rows], np.float64)
        ax.plot(its, y, alpha=0.3, lw=0.8)
        sm, out = None, []
        for v in y:
            sm = v if sm is None or np.isnan(sm) else \
                args.ewma * sm + (1 - args.ewma) * v
            out.append(sm)
        ax.plot(its, out, lw=1.6)
        ax.set_title(key)
        ax.set_xlabel("iteration")
    ax = flat[len(loss_keys)]
    ax.plot(its, [r["lr_dec"] for r in rows], label="lr decoder")
    ax.plot(its, [r["lr_enc"] for r in rows], label="lr encoder")
    ax.set_title("learning rates")
    ax.set_yscale("log")
    ax.legend()
    for ax in flat[n:]:
        ax.axis("off")
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=110)
        print(f"wrote {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
