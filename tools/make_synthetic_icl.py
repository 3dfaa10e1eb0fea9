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


def main(out_dir: str, n_frames: int = 12):
    import cv2

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from difusion_tpu.data import SyntheticSequence
    from difusion_tpu.data.production import ICLNUIMSequence

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)

    seq = SyntheticSequence(n_frames=n_frames, h=480, w=640,
                            calib=ICLNUIMSequence.CALIB,
                            corrugation=0.1, motion_scale=0.5)
    rows = []
    for i, frame in enumerate(seq):
        cv2.imwrite(str(out / "rgb" / f"{i}.png"),
                    cv2.cvtColor(frame.rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(out / "depth" / f"{i}.png"), frame.depth)  # u16 raw
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
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 12)
