"""Tests for the grid-based point-cloud ops against brute-force NumPy
(capability parity with pytorch/system/ext/pcproc/pcproc.cu and the tracker's
point_box_filter)."""
import numpy as np
import jax.numpy as jnp

from difusion_tpu.ops import pcproc


def _cloud(rng, n, scale=1.0):
    return (rng.uniform(-1, 1, (n, 3)) * scale).astype(np.float32)


def test_radius_neighbors_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = _cloud(rng, 256)
    valid = np.ones(256, bool)
    valid[::17] = False
    radius = 0.3
    grid = pcproc.build_grid(jnp.asarray(pts), jnp.asarray(valid), radius)
    idx, ok = pcproc.radius_neighbors(grid, jnp.asarray(pts), jnp.asarray(valid),
                                      radius, cell_cap=64)
    idx, ok = np.asarray(idx), np.asarray(ok)
    d2 = np.sum((pts[None] - pts[:, None]) ** 2, axis=-1)
    for q in range(0, 256, 13):
        if not valid[q]:
            assert not ok[q].any()
            continue
        found = set(idx[q][ok[q]].tolist())
        expect = set(np.where((d2[q] <= radius ** 2) & valid)[0].tolist())
        assert found == expect, (q, found ^ expect)


def test_remove_radius_outlier():
    rng = np.random.default_rng(1)
    cluster = _cloud(rng, 128, scale=0.05)            # dense cluster
    stragglers = _cloud(rng, 8, scale=0.02) + 5.0     # isolated far away
    pts = np.concatenate([cluster, stragglers]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    keep = pcproc.remove_radius_outlier(jnp.asarray(pts), jnp.asarray(valid),
                                        nb_points=16, radius=0.05, cell_cap=64)
    keep = np.asarray(keep)
    assert not keep[128:].any() or len(stragglers) >= 16
    d2 = np.sum((pts[None] - pts[:, None]) ** 2, axis=-1)
    expect = (d2 <= 0.05 ** 2).sum(axis=1) >= 16
    assert (keep == expect).all()


def test_estimate_normals_plane():
    rng = np.random.default_rng(2)
    xy = rng.uniform(-0.5, 0.5, (256, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.full((256, 1), 2.0, np.float32)], axis=1)
    valid = np.ones(256, bool)
    normal, ok = pcproc.estimate_normals(jnp.asarray(pts), jnp.asarray(valid),
                                         radius=0.2, cell_cap=64)
    normal, ok = np.asarray(normal), np.asarray(ok)
    assert ok.mean() > 0.9
    # plane normal is +-z; camera at origin -> flipped to -z
    assert np.allclose(normal[ok, 2], -1.0, atol=1e-3)


def test_point_box_filter_exact_means():
    rng = np.random.default_rng(3)
    pts = _cloud(rng, 512, scale=0.5)
    normals = _cloud(rng, 512)
    valid = np.ones(512, bool)
    valid[::7] = False
    vs = 0.1
    p, n, ok = pcproc.point_box_filter(jnp.asarray(pts), jnp.asarray(normals),
                                       jnp.asarray(valid), vs, out_budget=512)
    p, n, ok = np.asarray(p), np.asarray(n), np.asarray(ok)
    # shape contract: exactly out_budget rows even when out_budget == N
    assert p.shape == (512, 3) and n.shape == (512, 3) and ok.shape == (512,)

    ref = np.floor(pts / vs).astype(int)
    groups = {}
    for i in range(512):
        if not valid[i]:
            continue
        groups.setdefault(tuple(ref[i]), []).append(i)
    got = {tuple(np.round(pp, 5)) for pp in p[ok]}
    expect = {tuple(np.round(np.mean(pts[g], axis=0), 5)) for g in groups.values()}
    assert len(got) == len(expect)
    # match each expected mean to a produced one
    for e in expect:
        assert any(np.allclose(e, g, atol=1e-4) for g in got)


def test_point_box_filter_nan_invalid_rows_are_contained():
    """NaN coordinates/normals on INVALID rows must not leak into any
    output voxel (the prefix-sum formulation would otherwise propagate a
    NaN to every later segment)."""
    rng = np.random.default_rng(7)
    pts = _cloud(rng, 256, scale=0.5)
    normals = _cloud(rng, 256)
    valid = np.ones(256, bool)
    valid[:32] = False
    pts_nan = pts.copy()
    pts_nan[:32] = np.nan
    normals_nan = normals.copy()
    normals_nan[:32] = np.nan
    vs = 0.1
    a = pcproc.point_box_filter(jnp.asarray(pts_nan), jnp.asarray(normals_nan),
                                jnp.asarray(valid), vs, out_budget=256)
    b = pcproc.point_box_filter(jnp.asarray(pts), jnp.asarray(normals),
                                jnp.asarray(valid), vs, out_budget=256)
    pa, na, oka = map(np.asarray, a)
    pb, nb, okb = map(np.asarray, b)
    assert np.isfinite(pa[oka]).all() and np.isfinite(na[oka]).all()
    # identical voxel means whether invalid rows hold NaN or garbage values
    sa = pa[oka][np.lexsort(pa[oka].T)]
    sb = pb[okb][np.lexsort(pb[okb].T)]
    np.testing.assert_allclose(sa, sb, atol=5e-5)


def test_point_box_filter_aabb_matches_lexsort():
    """The frustum-keyed single-sort path produces the same voxel means as
    the generic lexsort path (different output order allowed)."""
    rng = np.random.default_rng(5)
    pts = _cloud(rng, 1024, scale=1.5)
    normals = _cloud(rng, 1024)
    valid = rng.random(1024) > 0.1
    vs = 0.1
    a = pcproc.point_box_filter(jnp.asarray(pts), jnp.asarray(normals),
                                jnp.asarray(valid), vs, out_budget=1024)
    b = pcproc.point_box_filter(jnp.asarray(pts), jnp.asarray(normals),
                                jnp.asarray(valid), vs, out_budget=1024,
                                aabb=((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0)))
    pa = np.asarray(a[0])[np.asarray(a[2])]
    pb = np.asarray(b[0])[np.asarray(b[2])]
    # same voxel set; means may differ by prefix-sum rounding (the two paths
    # sort segments into different global positions)
    assert len(pa) == len(pb)
    pb_sorted = pb[np.lexsort(pb.T)]
    pa_sorted = pa[np.lexsort(pa.T)]
    np.testing.assert_allclose(pa_sorted, pb_sorted, atol=5e-5)


def test_compact():
    valid = jnp.asarray(np.array([False, True, False, True, True, False]))
    vals = jnp.arange(6)
    mask, out = pcproc.compact(valid, 4, vals)
    assert np.asarray(mask).tolist() == [True, True, True, False]
    assert np.asarray(out)[:3].tolist() == [1, 3, 4]
