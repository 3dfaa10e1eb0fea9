"""Production dataset loader tests against synthetic on-disk fixtures
(parity with pytorch/dataset/production/icl_nuim.py)."""
import numpy as np
import pytest

import conftest  # noqa: F401

cv2 = pytest.importorskip("cv2")

from difusion_tpu.data import ICLNUIMSequence, ScanNetSequence, open_sequence
from difusion_tpu.utils.motion import Isometry, Quaternion


def _make_icl_dir(tmp_path, n=5, seed=0):
    rng = np.random.default_rng(seed)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    for i in range(n):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = (rng.uniform(0.5, 4.0, (48, 64)) * 5000).astype(np.uint16)
        cv2.imwrite(str(tmp_path / "rgb" / f"{i}.png"), rgb)
        cv2.imwrite(str(tmp_path / "depth" / f"{i}.png"), depth)
    # TUM-freiburg groundtruth: id tx ty tz qx qy qz qw
    rows = []
    for i in range(n):
        q = Quaternion(axis=np.array([0.0, 0.0, 1.0]), degrees=3.0 * i)
        t = np.array([0.1 * i, 0.0, 0.05 * i])
        rows.append([i, t[0], t[1], t[2], *q.vector, q.w])
    np.savetxt(tmp_path / "groundtruth.txt", np.asarray(rows))
    return tmp_path


def test_icl_sequence_iteration(tmp_path):
    path = _make_icl_dir(tmp_path)
    seq = ICLNUIMSequence(str(path), load_gt=True,
                          first_tq=[-1.4, 1.5, 1.5, 0.0, -1.0, 0.0, 0.0])
    assert len(seq) == 5
    assert len(seq.gt_trajectory) == 5
    # first gt pose re-anchored to first_iso (icl_nuim.py:30-33)
    d = seq.first_iso.inv().dot(seq.gt_trajectory[0]).log()
    assert np.abs(d).max() < 1e-6

    frames = list(seq)
    assert len(frames) == 5
    f = frames[0]
    assert f.rgb.shape == (48, 64, 3) and f.rgb.dtype == np.uint8
    assert f.depth.shape == (48, 64) and f.depth.dtype == np.uint16
    d_m = f.depth / f.calib.dcam_scale
    assert d_m.max() <= 4.1 and d_m.min() >= 0.4
    assert f.calib.fx == 481.2 and f.calib.dcam_scale == 5000.0

    # start/end slicing
    seq2 = ICLNUIMSequence(str(path), start_frame=1, end_frame=4, load_gt=True)
    assert len(seq2) == 3


def test_scannet_sequence(tmp_path):
    rng = np.random.default_rng(1)
    for d in ("color", "depth", "pose", "intrinsic"):
        (tmp_path / d).mkdir()
    for i in range(4):
        rgb = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        depth = (rng.uniform(0.5, 4.0, (48, 64)) * 1000).astype(np.uint16)
        cv2.imwrite(str(tmp_path / "color" / f"{i}.jpg"), rgb)
        cv2.imwrite(str(tmp_path / "depth" / f"{i}.png"), depth)
        np.savetxt(tmp_path / "pose" / f"{i}.txt", Isometry.random(
            np.random.default_rng(i)).matrix)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 300.0, 300.0, 32.0, 24.0
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_depth.txt", K)

    seq = open_sequence("scannet.ScanNetSequence", path=str(tmp_path),
                        frame_skip=2)
    assert len(seq) == 2
    f = next(seq)
    assert f.depth.shape == (48, 64)
    assert f.rgb.shape == (48, 64, 3)      # color resized to depth res
    assert f.calib.fx == 300.0
    assert f.gt_pose is not None
