"""Map semantics tests: allocation, pruning, fusion algebra, SDF query,
save/load, latent optimization."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difusion_tpu.core import map as M
from difusion_tpu.models import (
    DecoderSpec, EncoderSpec, fold_decoder_params, fold_encoder_params,
    init_decoder_params, init_encoder_params,
)

SPEC_D = DecoderSpec()
SPEC_E = EncoderSpec()


@pytest.fixture(scope="module")
def nets():
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    enc = fold_encoder_params(init_encoder_params(SPEC_E, jax.random.key(1)))
    return dec, enc


def small_cfg(**kw):
    defaults = dict(bound_min=(-1.0, -1.0, -1.0), n_xyz=(20, 20, 20), voxel_size=0.1,
                    latent_dim=29, capacity=4096, prune_min_vox_obs=4,
                    ignore_count_th=8.0, encoder_count_th=600.0)
    defaults.update(kw)
    return M.MapConfig(**defaults)


def plane_cloud(n=4000, seed=0, z=0.05):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.8, 0.8, size=(n, 2))
    pts = np.stack([xy[:, 0], xy[:, 1], np.full(n, z)], axis=1).astype(np.float32)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    return jnp.asarray(pts), jnp.asarray(normals)


class TestGrid:
    def test_linearize_roundtrip(self):
        cfg = small_cfg()
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 20, size=(100, 3)).astype(np.int32)
        lin = M.linearize(cfg, jnp.asarray(ids))
        rec = M.unlinearize(cfg, lin)
        np.testing.assert_array_equal(np.asarray(rec), ids)

    def test_cell_of_matches_reference_formula(self):
        cfg = small_cfg()
        # ceil(x) - 1, not floor: integers are boundary cases
        pn = jnp.asarray([[0.5, 1.0, 1.5]])
        cell = M.cell_of(cfg, pn)
        np.testing.assert_array_equal(np.asarray(cell)[0], [0, 0, 1])

    def test_dilate6(self):
        cfg = small_cfg(n_xyz=(5, 5, 5))
        flag = np.zeros(125, bool)
        center = M.linearize(cfg, jnp.asarray([[2, 2, 2]], jnp.int32))[0]
        flag[int(center)] = True
        out = np.asarray(M.dilate6(cfg, jnp.asarray(flag)))
        assert out.sum() == 7  # center + 6 neighbors
        corner = M.linearize(cfg, jnp.asarray([[0, 0, 0]], jnp.int32))[0]
        flag2 = np.zeros(125, bool)
        flag2[int(corner)] = True
        out2 = np.asarray(M.dilate6(cfg, jnp.asarray(flag2)))
        assert out2.sum() == 4  # clamped at the boundary


class TestIntegrate:
    def test_allocation_and_pruning(self, nets):
        _, enc = nets
        cfg = small_cfg()
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud()
        valid = jnp.ones(pts.shape[0], bool)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, valid)
        n_occ = int(state.n_occupied)
        assert n_occ > 0
        # indexer/positions consistency
        indexer = np.asarray(state.indexer)
        positions = np.asarray(state.positions)
        occupied_cells = np.where(indexer >= 0)[0]
        assert len(occupied_cells) == n_occ
        for cell in occupied_cells[:50]:
            assert positions[indexer[cell]] == cell
        # a single isolated point must not allocate (prune_min_vox_obs)
        state2 = M.create_map_state(cfg)
        single = jnp.asarray([[0.85, 0.85, 0.85]], jnp.float32)
        nrm1 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        state2 = M.integrate_keyframe(cfg, enc, state2, single, nrm1, jnp.ones(1, bool))
        assert int(state2.n_occupied) == 0

    def test_neighborhood_expansion(self, nets):
        """Allocated voxel set must include 6-neighbors of observed voxels."""
        _, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0)
        state = M.create_map_state(cfg)
        # 10 points in exactly one voxel
        pts = jnp.asarray(np.full((10, 3), 0.05, np.float32))
        nrm = jnp.asarray(np.tile([[0, 0, 1]], (10, 1)).astype(np.float32))
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(10, bool))
        assert int(state.n_occupied) == 7  # center + 6 dummies

    def test_fusion_running_mean(self, nets):
        """Integrating identical observations twice must leave latents at the
        same mean while doubling the count (weighted-mean algebra)."""
        _, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(1000)
        valid = jnp.ones(pts.shape[0], bool)
        s1 = M.integrate_keyframe(cfg, enc, state, pts, nrm, valid)
        s2 = M.integrate_keyframe(cfg, enc, s1, pts, nrm, valid)
        touched = np.asarray(s1.obs_count) > 0
        np.testing.assert_allclose(np.asarray(s2.latents)[touched],
                                   np.asarray(s1.latents)[touched], atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2.obs_count)[touched],
                                   2 * np.asarray(s1.obs_count)[touched], rtol=1e-6)

    def test_mesh_dirty_marks(self, nets):
        _, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(1000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))
        dirty = np.asarray(state.mesh_dirty)
        counts = np.asarray(state.obs_count)
        np.testing.assert_array_equal(dirty, counts > 0)

    def test_invalid_points_ignored(self, nets):
        _, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0)
        pts, nrm = plane_cloud(1000)
        all_valid = M.integrate_keyframe(cfg, enc, M.create_map_state(cfg), pts, nrm,
                                         jnp.ones(pts.shape[0], bool))
        none_valid = M.integrate_keyframe(cfg, enc, M.create_map_state(cfg), pts, nrm,
                                          jnp.zeros(pts.shape[0], bool))
        assert int(all_valid.n_occupied) > 0
        assert int(none_valid.n_occupied) == 0

    def test_jit_stability(self, nets):
        """integrate must be jittable with cfg static and not recompile for
        same-shaped inputs."""
        _, enc = nets
        cfg = small_cfg()
        fn = jax.jit(M.integrate_keyframe, static_argnums=0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(2000, seed=1)
        state = fn(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))
        pts2, nrm2 = plane_cloud(2000, seed=2, z=0.15)
        state = fn(cfg, enc, state, pts2, nrm2, jnp.ones(pts2.shape[0], bool))
        assert fn._cache_size() == 1


class TestQuery:
    def test_query_valid_mask_and_ranges(self, nets):
        dec, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0, ignore_count_th=8.0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(4000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))
        q = jnp.asarray([[0.0, 0.0, 0.05],    # on the plane, well observed
                         [0.0, 0.0, 0.85],    # far away: unallocated
                         [5.0, 0.0, 0.0]])    # out of bounds
        sdf, std, valid = M.query_sdf(cfg, dec, SPEC_D, state, q)
        v = np.asarray(valid)
        assert v[0] and not v[1] and not v[2]
        assert np.all(np.abs(np.asarray(sdf)) <= 1.0)
        assert np.all(np.asarray(std) > 0.05)

    def test_query_gradient_flows_to_xyz(self, nets):
        dec, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0, ignore_count_th=8.0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(4000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))

        def f(xyz):
            sdf, std, valid = M.query_sdf(cfg, dec, SPEC_D, state, xyz)
            return jnp.sum(jnp.where(valid, sdf, 0.0))

        g = jax.grad(f)(jnp.asarray([[0.0, 0.0, 0.05]], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestSaveLoad:
    def test_roundtrip(self, nets, tmp_path):
        _, enc = nets
        cfg = small_cfg()
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud()
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))
        path = tmp_path / "map.npz"
        M.save_map(str(path), cfg, state)
        cfg2, state2 = M.load_map(str(path))
        assert cfg2 == cfg
        for name in state._fields:
            np.testing.assert_array_equal(np.asarray(getattr(state, name)),
                                          np.asarray(getattr(state2, name)))


class TestOptimize:
    @pytest.mark.slow
    def test_optimize_decreases_nll(self, nets):
        dec, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0, ignore_count_th=0.0, encoder_count_th=10.0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(4000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm, jnp.ones(pts.shape[0], bool))
        slot_ids, rel, gt, mask = M.build_optimize_samples(
            cfg, state, pts, nrm, jnp.ones(pts.shape[0], bool), jax.random.key(0))
        assert int(mask.sum()) > 0

        def nll(latents):
            from difusion_tpu.models.decoder import decode
            lat = latents[jnp.clip(slot_ids, 0, cfg.capacity - 1)]
            sdf, std = decode(dec, SPEC_D, lat, rel)
            pd, g = jnp.clip(sdf, -0.2, 0.2), jnp.clip(gt, -0.2, 0.2)
            ll = 0.5 * ((g - pd) / std) ** 2 + jnp.log(std)
            return float(jnp.sum(ll * mask) / jnp.maximum(mask.sum(), 1))

        before = nll(state.latents)
        state2 = M.optimize_latents(cfg, dec, SPEC_D, state, slot_ids, rel, gt, mask,
                                    n_iters=10)
        after = nll(state2.latents)
        assert after < before
        assert bool(jnp.any(state2.optimized))
        # every touched slot fit the working table: no truncation recorded
        assert int(state2.opt_overflow) == 0

    def test_optimize_max_slots_overflow_is_counted(self, nets):
        """Touched slots beyond the working-table budget keep fused values
        AND the truncation is recorded in opt_overflow (round-2 advisor
        finding: the cap used to be silent)."""
        dec, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0, ignore_count_th=0.0,
                        encoder_count_th=10.0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(4000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm,
                                     jnp.ones(pts.shape[0], bool))
        slot_ids, rel, gt, mask = M.build_optimize_samples(
            cfg, state, pts, nrm, jnp.ones(pts.shape[0], bool),
            jax.random.key(0))
        n_unique = len(np.unique(np.asarray(slot_ids)[np.asarray(mask)]))
        budget = max(n_unique // 2, 1)
        state2 = M.optimize_latents(cfg, dec, SPEC_D, state, slot_ids, rel,
                                    gt, mask, n_iters=2, max_slots=budget)
        assert int(state2.opt_overflow) == n_unique - budget
        # a second truncated call accumulates
        state3 = M.optimize_latents(cfg, dec, SPEC_D, state2, slot_ids, rel,
                                    gt, mask, n_iters=2, max_slots=budget)
        assert int(state3.opt_overflow) == 2 * (n_unique - budget)


class TestMergeOptimizeResult:
    def test_delta_deintegration_formula(self, nets):
        """merged = (cur*n_cur + (new-old)*n_old)/n_cur (reference
        map.py:321-335)."""
        cfg = small_cfg()
        state = M.create_map_state(cfg)
        rng = np.random.default_rng(0)
        cur = rng.normal(size=(cfg.capacity, cfg.latent_dim)).astype(np.float32)
        old = rng.normal(size=(cfg.capacity, cfg.latent_dim)).astype(np.float32)
        new = rng.normal(size=(cfg.capacity, cfg.latent_dim)).astype(np.float32)
        n_cur = rng.uniform(1, 100, cfg.capacity).astype(np.float32)
        n_old = rng.uniform(1, 100, cfg.capacity).astype(np.float32)
        touched = rng.random(cfg.capacity) < 0.3
        state = state._replace(latents=jnp.asarray(cur),
                               obs_count=jnp.asarray(n_cur))
        out = M.merge_optimize_result(state, jnp.asarray(old), jnp.asarray(new),
                                      jnp.asarray(n_old), jnp.asarray(touched))
        expect = (cur * n_cur[:, None] + (new - old) * n_old[:, None]) / n_cur[:, None]
        got = np.asarray(out.latents)
        # f32 cancellation amplified by n_old/n_cur ratios up to 100x
        np.testing.assert_allclose(got[touched], expect[touched],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[~touched], cur[~touched])
        assert (np.asarray(out.optimized)[touched]).all()

    def test_merge_without_interleaved_fusion_is_replacement(self, nets):
        """If nothing fused since the snapshot (cur==old, n_cur==n_old), the
        merge must reduce to plain replacement by the optimized latents."""
        cfg = small_cfg()
        rng = np.random.default_rng(1)
        cur = rng.normal(size=(cfg.capacity, cfg.latent_dim)).astype(np.float32)
        new = rng.normal(size=(cfg.capacity, cfg.latent_dim)).astype(np.float32)
        n = rng.uniform(1, 100, cfg.capacity).astype(np.float32)
        touched = jnp.ones(cfg.capacity, bool)
        state = M.create_map_state(cfg)._replace(latents=jnp.asarray(cur),
                                                 obs_count=jnp.asarray(n))
        out = M.merge_optimize_result(state, jnp.asarray(cur), jnp.asarray(new),
                                      jnp.asarray(n), touched)
        np.testing.assert_allclose(np.asarray(out.latents), new,
                                   rtol=1e-4, atol=1e-5)


class TestSegmentOps:
    def test_pack_batch_matches_reference_semantics(self):
        from difusion_tpu.ops.segment import pack_batch
        rng = np.random.default_rng(0)
        gids = jnp.asarray(rng.integers(0, 5, 64).astype(np.int32))
        packed, counts = pack_batch(gids, n_batch=5, n_point=8)
        packed, counts = np.asarray(packed), np.asarray(counts)
        g = np.asarray(gids)
        for b in range(5):
            members = set(np.where(g == b)[0].tolist())
            got = [i for i in packed[b] if i >= 0]
            assert counts[b] == min(len(members), 8)
            assert len(got) == counts[b]
            assert set(got) <= members
            # slots after count are padding
            assert (packed[b, counts[b]:] == -1).all()

    def test_pack_samples_draws_from_own_group(self):
        from difusion_tpu.ops.segment import pack_samples
        rng = np.random.default_rng(1)
        idxr = jnp.asarray(rng.integers(0, 6, 128).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        packed, ok = pack_samples(idxr, count=4, key=jax.random.key(0),
                                  max_batches=8, sample_values=vals)
        packed, ok = np.asarray(packed), np.asarray(ok)
        assert ok[:6].all() and not ok[6:].any()
        v = np.asarray(vals)
        g = np.asarray(idxr)
        uniq = np.unique(g)   # groups ordered by value = segment order
        for b in range(6):
            members = v[g == uniq[b]]
            for row in packed[b]:
                assert any(np.allclose(row, m) for m in members)


class TestVisuals:
    def test_map_visuals(self, nets, tmp_path):
        from difusion_tpu.core import visuals as V
        dec, enc = nets
        cfg = small_cfg(prune_min_vox_obs=0, ignore_count_th=0.0)
        state = M.create_map_state(cfg)
        pts, nrm = plane_cloud(4000)
        state = M.integrate_keyframe(cfg, enc, state, pts, nrm,
                                     jnp.ones(pts.shape[0], bool))
        fast = V.get_fast_preview_visuals(cfg, state)
        assert len(fast.block_starts) > 10
        assert fast.block_size == cfg.voxel_size

        vis = V.get_map_visuals(cfg, dec, SPEC_D, state, voxel_resolution=4)
        assert vis.sample_xyz.shape[0] == len(vis.sample_sdf)
        assert 0.0 <= vis.sample_sdf.min() and vis.sample_sdf.max() <= 1.0
        # sample positions fall inside their blocks' world extent
        assert vis.sample_xyz.min() >= np.asarray(cfg.bound_min).min() - 1e-5
        V.write_pointcloud_ply(str(tmp_path / "s.ply"), vis.sample_xyz,
                               vis.sample_sdf)
        assert (tmp_path / "s.ply").stat().st_size > 100
