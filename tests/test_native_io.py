"""Native frame-IO tests: PNG decode parity with cv2 and prefetcher ordering
(the C++ runtime component replacing host-side frame decoding)."""
import numpy as np
import pytest

import conftest  # noqa: F401

cv2 = pytest.importorskip("cv2")

from difusion_tpu.data import native_io


pytestmark = pytest.mark.skipif(not native_io.native_available(),
                                reason="native frameio could not be built")


def _write_pngs(tmp_path, n=6, seed=0):
    rng = np.random.default_rng(seed)
    rgb_paths, depth_paths = [], []
    for i in range(n):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = rng.integers(0, 60000, (48, 64), dtype=np.uint16)
        rp = str(tmp_path / f"rgb_{i}.png")
        dp = str(tmp_path / f"d_{i}.png")
        cv2.imwrite(rp, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(dp, depth)
        rgb_paths.append(rp)
        depth_paths.append(dp)
    return rgb_paths, depth_paths


def test_png_decode_matches_cv2(tmp_path):
    rgb_paths, depth_paths = _write_pngs(tmp_path, n=2)
    for p in rgb_paths:
        ours = native_io.read_png(p)
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert ours.dtype == np.uint8
        np.testing.assert_array_equal(ours, ref)
    for p in depth_paths:
        ours = native_io.read_png(p)
        ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert ours.dtype == np.uint16
        np.testing.assert_array_equal(ours, ref)


def test_png_decode_error_paths(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(ValueError):
        native_io.read_png(str(bad))
    with pytest.raises(ValueError):
        native_io.read_png(str(tmp_path / "missing.png"))


def test_prefetcher_sequential_frames(tmp_path):
    _, depth_paths = _write_pngs(tmp_path, n=6, seed=1)
    pf = native_io.PngPrefetcher(depth_paths, ring_size=3, n_threads=2)
    for p in depth_paths:
        got = pf.next()
        ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(got, ref)
    with pytest.raises(ValueError):
        pf.next()   # exhausted
    pf.close()


def test_loader_uses_native_path(tmp_path):
    """ICL-style directory decodes through the native reader."""
    from difusion_tpu.data.production import _imread_color, _imread_depth_raw
    rgb_paths, depth_paths = _write_pngs(tmp_path, n=1, seed=2)
    rgb = _imread_color(rgb_paths[0])
    assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
    depth = _imread_depth_raw(depth_paths[0])
    assert depth.shape == (48, 64) and depth.dtype == np.float32
