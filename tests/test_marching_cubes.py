"""Marching cubes kernel tests against analytic fields, plus the incremental
mesher end-to-end with the real reference prior."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import conftest
from difusion_tpu.core import map as M
from difusion_tpu.ops import mc_tables
from difusion_tpu.ops.marching_cubes import corner_field, marching_cubes_sparse, mc_triangles_np
from difusion_tpu.ops.sampling import block_lattice, get_samples


def test_get_samples_parity():
    """Matches reference get_samples layout (x-major, step (b-a)/(r-1))."""
    s = np.asarray(get_samples(8, a=-0.5, b=1.25))
    assert s.shape == (512, 3)
    np.testing.assert_allclose(s[0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(s[1], [-0.5, -0.5, -0.25])
    np.testing.assert_allclose(s[8], [-0.5, -0.25, -0.5])
    np.testing.assert_allclose(s[64], [-0.25, -0.5, -0.5])
    np.testing.assert_allclose(s[-1], [1.25, 1.25, 1.25])


def test_block_lattice_margin():
    lat = np.asarray(block_lattice(4))
    assert lat.shape == (512, 3)
    # covers voxel-centered range [-1, 0.75] (half-voxel margin each side)
    np.testing.assert_allclose(lat.min(), -1.0)
    np.testing.assert_allclose(lat.max(), 0.75)


def _dense_world(n=8, voxel=0.25, r=4):
    """Fully-allocated cubic world with analytic per-block lattices."""
    cfg_xyz = (n, n, n)
    n_cells = n ** 3
    indexer = np.arange(n_cells, dtype=np.int32)
    slot_to_batch = np.concatenate([np.arange(n_cells, dtype=np.int32), [-1]])
    valid_blocks = np.arange(n_cells, dtype=np.int32)
    lat = np.asarray(block_lattice(r))  # (K, 3) voxel-center-relative
    cell = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1).reshape(-1, 3)
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    world = bound_min + (cell[:, None, :] + 0.5 + lat[None]) * voxel  # (B, K, 3)
    return cfg_xyz, indexer, slot_to_batch, valid_blocks, world, bound_min, voxel


class TestCornerField:
    def test_linear_field_exact(self):
        """Blending consistent lattices of a linear field must be exact --
        catches any lattice-index/weight bug in the cross-block blend."""
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        f = world[..., 2]  # f(p) = z
        side = 2 * r
        cube = f.reshape(-1, side, side, side).astype(np.float32)
        std = np.full_like(cube, 0.1)
        c_sdf, c_std, c_ok = corner_field(jnp.asarray(indexer), jnp.asarray(s2b),
                                          jnp.asarray(blocks), jnp.asarray(cube),
                                          jnp.asarray(std), cfg_xyz, r)
        c_sdf = np.asarray(c_sdf)
        ok = np.asarray(c_ok)
        # corner (B, cx, cy, cz) is at world z = bmin + (cell_z + cz/r)*voxel
        n = cfg_xyz[0]
        cell = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1).reshape(-1, 3)
        cz = np.arange(r + 1) / r
        expected = bmin[2] + (cell[:, 2][:, None] + cz[None]) * voxel  # (B, r+1)
        expected = np.broadcast_to(expected[:, None, None, :], c_sdf.shape)
        np.testing.assert_allclose(c_sdf[ok], expected[ok], atol=1e-5)
        # interior corners must be valid
        assert ok.mean() > 0.9

    def test_own_block_missing_invalidates(self):
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        # remove center block from the batch: its own corners invalid
        center = len(blocks) // 2
        s2b = s2b.copy()
        s2b[center] = -1
        cube = world[..., 2].reshape(len(blocks), 2 * r, 2 * r, 2 * r).astype(np.float32)
        std = np.full_like(cube, 0.1)
        _, _, c_ok = corner_field(jnp.asarray(indexer), jnp.asarray(s2b),
                                  jnp.asarray(blocks), jnp.asarray(cube),
                                  jnp.asarray(std), cfg_xyz, r)
        ok = np.asarray(c_ok)
        assert not ok[center].any()


def _sphere_field(world, center=(0.0, 0.0, 0.0), radius=0.6):
    d = np.linalg.norm(world - np.asarray(center), axis=-1)
    return (d - radius).astype(np.float32)


class TestMarchingCubes:
    @pytest.mark.parametrize("interpolate", [True, False])
    @pytest.mark.slow
    def test_sphere_surface(self, interpolate):
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        f = _sphere_field(world)
        side = 2 * r
        cube = f.reshape(-1, side, side, side)
        std = np.full_like(cube, 0.1)
        res = marching_cubes_sparse(jnp.asarray(indexer), jnp.asarray(s2b),
                                    jnp.asarray(blocks), jnp.asarray(cube),
                                    jnp.asarray(std), cfg_xyz, r, 1 << 16,
                                    interpolate=interpolate)
        tris, stds, _, count = mc_triangles_np(res)
        assert 0 < count < 1 << 16
        tris = tris * voxel + bmin  # to world
        # every vertex close to the sphere
        d = np.linalg.norm(tris.reshape(-1, 3), axis=1)
        assert np.abs(d - 0.6).max() < voxel / r + 1e-3
        # total area close to analytic 4*pi*R^2
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.05
        # per-vertex std propagated
        np.testing.assert_allclose(stds, 0.1, atol=1e-5)

    def test_watertight_soup(self):
        """Each interior edge must be shared by exactly two triangles."""
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        cube = _sphere_field(world).reshape(-1, 8, 8, 8)
        std = np.full_like(cube, 0.1)
        res = marching_cubes_sparse(jnp.asarray(indexer), jnp.asarray(s2b),
                                    jnp.asarray(blocks), jnp.asarray(cube),
                                    jnp.asarray(std), cfg_xyz, r, 1 << 16)
        tris, _, _, count = mc_triangles_np(res)
        verts = tris.reshape(-1, 3)
        # quantize vertices to merge duplicates
        key = np.round(verts / 1e-4).astype(np.int64)
        _, inv = np.unique(key, axis=0, return_inverse=True)
        faces = inv.reshape(-1, 3)
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        # closed surface: every edge appears exactly twice
        assert (counts == 2).all()

    @pytest.mark.slow
    def test_max_std_pruning(self):
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        cube = _sphere_field(world).reshape(-1, 8, 8, 8)
        std = np.full_like(cube, 0.5)
        res = marching_cubes_sparse(jnp.asarray(indexer), jnp.asarray(s2b),
                                    jnp.asarray(blocks), jnp.asarray(cube),
                                    jnp.asarray(std), cfg_xyz, r, 1 << 16,
                                    max_std=0.15)
        assert int(res.count) == 0

    def test_triangle_budget_overflow(self):
        r = 4
        cfg_xyz, indexer, s2b, blocks, world, bmin, voxel = _dense_world(r=r)
        cube = _sphere_field(world).reshape(-1, 8, 8, 8)
        std = np.full_like(cube, 0.1)
        res = marching_cubes_sparse(jnp.asarray(indexer), jnp.asarray(s2b),
                                    jnp.asarray(blocks), jnp.asarray(cube),
                                    jnp.asarray(std), cfg_xyz, r, 100)
        assert int(res.count) > 100           # true count reported
        assert res.triangles.shape[1] == 100   # buffer clamped


@pytest.mark.slow
@pytest.mark.skipif(not conftest.reference_ckpt_available(),
                    reason="reference checkpoint not mounted")
class TestEndToEndMesh:
    def test_sphere_cloud_to_mesh(self, tmp_path):
        """BASELINE config-1 analog: encode->fuse->marching-cubes with the
        pretrained prior on a synthetic spherical surface cloud."""
        import jax
        from difusion_tpu.core.meshing import MeshExtractor
        from difusion_tpu.models import fold_decoder_params, fold_encoder_params
        from difusion_tpu.models import torch_import as TI

        dec_p, enc_p, spec_d, _, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
        dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_p))
        enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_p))

        rng = np.random.default_rng(0)
        n = 60000
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radius = 1.0
        pts = (dirs * radius).astype(np.float32)
        normals = dirs.astype(np.float32)

        cfg = M.MapConfig(bound_min=(-1.6, -1.6, -1.6), n_xyz=(32, 32, 32),
                          voxel_size=0.1, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=8.0)
        state = M.create_map_state(cfg)
        state = M.integrate_keyframe(cfg, enc, state, jnp.asarray(pts),
                                     jnp.asarray(normals), jnp.ones(n, bool))
        assert int(state.n_occupied) > 100

        extractor = MeshExtractor(cfg, dec, spec_d, voxel_resolution=4,
                                  max_triangles=1 << 19)
        state = extractor.extract(state, max_std=0.3)
        tris, stds = extractor.triangles()
        assert len(tris) > 1000
        d = np.linalg.norm(tris.reshape(-1, 3), axis=1)
        # the prior should reconstruct the sphere to a few centimeters
        assert abs(np.median(d) - radius) < 0.03
        assert np.abs(d - radius).mean() < 0.05
        # second extract with no dirty blocks is a no-op
        n_before = len(tris)
        state = extractor.extract(state)
        assert len(extractor.triangles()[0]) == n_before
        # exports
        extractor.write_obj(str(tmp_path / "m.obj"))
        extractor.write_ply(str(tmp_path / "m.ply"))
        assert (tmp_path / "m.obj").stat().st_size > 1000
        assert (tmp_path / "m.ply").stat().st_size > 1000


@pytest.mark.skipif(not conftest.reference_ckpt_available(),
                    reason="reference checkpoint not mounted")
@pytest.mark.slow
def test_incremental_splice_replaces_stale_triangles():
    """When a voxel's latent changes and it re-meshes, its cached triangles
    must be replaced, not duplicated (reference cache splice,
    map.py:701-714)."""
    import jax
    from difusion_tpu.core import map as M
    from difusion_tpu.core.meshing import MeshExtractor
    from difusion_tpu.models import torch_import as TI
    from difusion_tpu.models.decoder import fold_decoder_params
    from difusion_tpu.models.encoder import fold_encoder_params

    dec_t, enc_t, spec_d, _, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))

    cfg = M.MapConfig(bound_min=(-1.0, -1.0, -1.0), n_xyz=(20, 20, 20),
                      voxel_size=0.1, capacity=4096, prune_min_vox_obs=2,
                      ignore_count_th=1.0, encoder_count_th=600.0)
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.6, 0.6, (4000, 2)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([xy, np.full((4000, 1), 0.05, np.float32)], 1))
    nrm = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (4000, 1)))
    state = M.integrate_keyframe(cfg, enc, M.create_map_state(cfg), pts, nrm,
                                 jnp.ones(4000, bool))

    mesher = MeshExtractor(cfg, dec, spec_d, voxel_resolution=2,
                           max_triangles=1 << 16)
    state = mesher.extract(state, max_std=10.0)
    tris1, _ = mesher.triangles()
    n1 = len(tris1)
    assert n1 > 50
    z1 = tris1[..., 2].mean()

    # second observation of the SAME surface shifted slightly: fusion updates
    # latents, dirty voxels re-mesh, count must not balloon
    pts2 = pts + jnp.asarray(np.array([[0, 0, 0.02]], np.float32))
    state = M.integrate_keyframe(cfg, enc, state, pts2, nrm, jnp.ones(4000, bool))
    assert bool(jnp.any(state.mesh_dirty))
    state = mesher.extract(state, max_std=10.0)
    tris2, _ = mesher.triangles()
    assert len(tris2) < n1 * 1.6, (n1, len(tris2))   # replaced, not appended
    # surface moved up towards the fused mean
    assert tris2[..., 2].mean() > z1
    # no-op extract keeps the cache identical
    n_stable = len(mesher.triangles()[0])
    state = mesher.extract(state, max_std=10.0)
    assert len(mesher.triangles()[0]) == n_stable


@pytest.mark.skipif(not conftest.reference_ckpt_available(),
                    reason="reference checkpoint not mounted")
@pytest.mark.slow
def test_fast_mode_matches_dense():
    """Coarse-to-fine "fast" evaluation (reference map.py:644-682) must
    reproduce the dense mesh within tolerance at r=8 while cutting decoder
    evals >= 3x."""
    import jax
    from difusion_tpu.core import map as M
    from difusion_tpu.core.meshing import MeshExtractor
    from difusion_tpu.models import torch_import as TI
    from difusion_tpu.models.decoder import fold_decoder_params
    from difusion_tpu.models.encoder import fold_encoder_params

    dec_t, enc_t, spec_d, _, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))

    rng = np.random.default_rng(3)
    n = 30000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radius = 0.5
    pts = jnp.asarray((dirs * radius).astype(np.float32))
    nrm = jnp.asarray(dirs.astype(np.float32))

    cfg = M.MapConfig(bound_min=(-0.8, -0.8, -0.8), n_xyz=(16, 16, 16),
                      voxel_size=0.1, capacity=1 << 13,
                      prune_min_vox_obs=4, ignore_count_th=8.0)
    base = M.integrate_keyframe(cfg, enc, M.create_map_state(cfg), pts, nrm,
                                jnp.ones(n, bool))

    r = 8
    dense = MeshExtractor(cfg, dec, spec_d, voxel_resolution=r,
                          max_triangles=1 << 19)
    dense.extract(base, max_std=0.3)
    fast = MeshExtractor(cfg, dec, spec_d, voxel_resolution=r,
                         max_triangles=1 << 19, fast=True,
                         refine_fraction=0.2)
    fast.extract(base, max_std=0.3)

    # >= 3x decoder-eval cut per block: (2r)^3 dense vs r^3 + refine_k
    evals_dense = (2 * r) ** 3
    evals_fast = r ** 3 + fast.refine_k
    assert evals_dense / evals_fast >= 3.0, (evals_dense, evals_fast)

    td, _ = dense.triangles()
    tf, _ = fast.triangles()
    assert len(td) > 500 and len(tf) > 500
    # same surface: radius statistics agree to a few millimeters
    dd = np.linalg.norm(td.reshape(-1, 3), axis=1)
    df = np.linalg.norm(tf.reshape(-1, 3), axis=1)
    assert abs(np.median(dd) - np.median(df)) < 0.004
    assert abs(dd.mean() - df.mean()) < 0.006
    # triangle counts in the same ballpark (no dropped/spurious sheets)
    assert 0.8 < len(tf) / len(td) < 1.25, (len(td), len(tf))
