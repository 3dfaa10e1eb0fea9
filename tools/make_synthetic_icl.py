"""Synthesize an ICL-NUIM-format dataset (rgb/*.png, depth/*.png uint16 at
1/5000 m, groundtruth.txt in TUM-freiburg convention) from the analytic
renderer, so the full production path -- reference config, ICL loader, native
PNG decode, uint16 depth, GT ATE -- runs end-to-end without the real dataset.

The loader applies the reference's y-flip + 180-degree-z canonicalization
(icl_nuim.py:38-51); poses are written conjugated so they parse back exactly.

Usage: python tools/make_synthetic_icl.py OUT_DIR [n_frames]
"""
import sys
from pathlib import Path

import numpy as np


def conjugate_for_freiburg(pose):
    """Inverse of the loader's parse transform: find W with
    parse(W) = cano^-1-free relative round-trip (see ICLNUIMSequence).
    parse does: R' = D R D (y row+col flip), t' = D t, then cano(180z) @ .;
    anchoring cancels cano, so writing W = D pose D suffices."""
    from difusion_tpu.utils.motion import Isometry, Quaternion
    D = np.diag([1.0, -1.0, 1.0])
    R = D @ pose.q.rotation_matrix @ D
    t = D @ pose.t
    return Isometry.from_matrix(R, t)


def main(out_dir: str, n_frames: int = 12, motion_scale: float = 0.5,
         noise_sigma: float = 0.0, dropout: float = 0.0, seed: int = 0,
         trajectory: str = "drift"):
    """``noise_sigma``: depth noise stddev as sigma * z^2 (the Kinect-like
    quadratic model, e.g. 0.004 -> 16 mm at 2 m); ``dropout``: fraction of
    valid pixels zeroed (sensor holes).  The depth PNGs are uint16 at
    1/5000 m, so sensor quantization is applied by construction.
    ``trajectory``: "drift" | "loop" | "out_back" (see SyntheticSequence)."""
    import cv2

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from difusion_tpu.data import SyntheticSequence
    from difusion_tpu.data.production import ICLNUIMSequence

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)

    seq = SyntheticSequence(n_frames=n_frames, h=480, w=640,
                            calib=ICLNUIMSequence.CALIB,
                            corrugation=0.1, motion_scale=motion_scale,
                            trajectory=trajectory)
    rng = np.random.default_rng(seed)
    rows = []
    for i, frame in enumerate(seq):
        cv2.imwrite(str(out / "rgb" / f"{i}.png"),
                    cv2.cvtColor(frame.rgb, cv2.COLOR_RGB2BGR))
        depth = frame.depth                                 # u16 raw units
        if noise_sigma > 0.0 or dropout > 0.0:
            z = depth.astype(np.float64) / seq.calib.dcam_scale
            if noise_sigma > 0.0:
                z = z + rng.normal(0.0, noise_sigma, z.shape) * z ** 2
            if dropout > 0.0:
                z = np.where(rng.random(z.shape) < dropout, 0.0, z)
            depth = np.clip(z * seq.calib.dcam_scale + 0.5,
                            0, 65535).astype(np.uint16)
        cv2.imwrite(str(out / "depth" / f"{i}.png"), depth)
        w = conjugate_for_freiburg(frame.gt_pose)
        qx, qy, qz = w.q.vector
        rows.append([i, w.t[0], w.t[1], w.t[2], qx, qy, qz, w.q.w])
    np.savetxt(out / "groundtruth.txt", np.asarray(rows))

    g0 = seq.gt_trajectory[0]
    qx, qy, qz = g0.q.vector
    first_tq = [g0.t[0], g0.t[1], g0.t[2], g0.q.w, qx, qy, qz]
    print(f"{out}: {n_frames} frames; first_tq = {[round(v, 6) for v in first_tq]}")
    return first_tq


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("out_dir")
    p.add_argument("n_frames", nargs="?", type=int, default=12)
    p.add_argument("--motion-scale", type=float, default=0.5)
    p.add_argument("--noise-sigma", type=float, default=0.0,
                   help="depth noise stddev = sigma * z^2 (m)")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="fraction of depth pixels zeroed")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trajectory", default="drift",
                   choices=["drift", "loop", "out_back"])
    a = p.parse_args()
    main(a.out_dir, a.n_frames, a.motion_scale, a.noise_sigma, a.dropout,
         a.seed, a.trajectory)
