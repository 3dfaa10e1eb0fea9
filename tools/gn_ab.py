"""Interleaved A/B of tracker-config overrides on the real device
(round-4 verdict item 4 measurement protocol): build a baseline system and
one per named override set, then alternate resident-fps passes A/B/A/B so
tunnel drift cannot masquerade as a win.  Reports per-arm mean/median fps
and device ms/frame deltas.

Usage: python tools/gn_ab.py [--passes 6] [--arms gather_cache,unroll2,both]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {
    "gather_cache": dict(sdf_gather_cache=True),
    "unroll2": dict(gn_unroll=2),
    "both": dict(sdf_gather_cache=True, gn_unroll=2),
    "compensated": dict(solve_dtype="compensated"),
    "blocked": dict(solve_dtype="blocked"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--arms", default="gather_cache,unroll2,both")
    args = ap.parse_args(argv)

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import bench

    names = args.arms.split(",")
    print("building baseline...", flush=True)
    systems = {"baseline": bench.build_system(n_chunks=3)}
    for n in names:
        print(f"building {n}...", flush=True)
        systems[n] = bench.build_system(n_chunks=3,
                                        tcfg_overrides=dict(ARMS[n]))

    fps = {k: [] for k in systems}
    for p in range(args.passes):
        for k, (system, chunks, h, w) in systems.items():
            r = bench.measure_resident(system, chunks, h, w, passes=1)
            fps[k].append(float(r[0]))
            print(f"pass {p} {k}: {r[0]:.1f} fps", flush=True)

    out = {}
    base_ms = 1e3 / np.mean(fps["baseline"])
    for k, v in fps.items():
        ms = 1e3 / np.mean(v)
        out[k] = {"fps_mean": round(float(np.mean(v)), 2),
                  "fps_median": round(float(np.median(v)), 2),
                  "fps_per_pass": [round(x, 1) for x in v],
                  "ms_per_frame": round(ms, 3),
                  "ms_delta_vs_baseline": round(ms - base_ms, 3)}
    print(json.dumps(out, indent=1))
    Path("/tmp/gn_ab.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
