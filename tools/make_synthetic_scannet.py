"""Synthesize a ScanNet-sens-export-format dataset (color/*.jpg,
depth/*.png uint16 mm, pose/*.txt camera-to-world, intrinsic/) from the
analytic renderer, to exercise the full config-4 path (hash-indexed map,
jpg color, mm depth, per-frame pose files) without the real dataset.

Usage: python tools/make_synthetic_scannet.py OUT_DIR [n_frames]
"""
import sys
from pathlib import Path

import numpy as np


def main(out_dir: str, n_frames: int = 12):
    import cv2

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from difusion_tpu.data import SyntheticSequence
    from difusion_tpu.ops.imgproc import Intrinsic

    out = Path(out_dir)
    for d in ("color", "depth", "pose", "intrinsic"):
        (out / d).mkdir(parents=True, exist_ok=True)

    calib = Intrinsic(481.2, 480.0, 319.5, 239.5, 1000.0)  # mm depth scale
    seq = SyntheticSequence(n_frames=n_frames, h=480, w=640, calib=calib,
                            corrugation=0.1, motion_scale=0.5)
    for i, frame in enumerate(seq):
        cv2.imwrite(str(out / "color" / f"{i}.jpg"),
                    cv2.cvtColor(frame.rgb, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(str(out / "depth" / f"{i}.png"), frame.depth)  # u16 mm
        np.savetxt(out / "pose" / f"{i}.txt", frame.gt_pose.matrix)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = calib.fx, calib.fy, calib.cx, calib.cy
    np.savetxt(out / "intrinsic" / "intrinsic_depth.txt", K)
    print(f"{out}: {n_frames} ScanNet-format frames")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 12)
