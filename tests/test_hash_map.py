"""Hash-indexed map tests: parallel insert/lookup under collisions, fusion
equivalence with the dense-indexer map, query validity, and save/load
(BASELINE config-4 capability: dynamic growth under a fixed-capacity hash)."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from difusion_tpu.core import hash_map as H
from difusion_tpu.core import map as M
from difusion_tpu.models.decoder import DecoderSpec, init_decoder_params, fold_decoder_params
from difusion_tpu.models.encoder import EncoderSpec, init_encoder_params, fold_encoder_params

SPEC_D = DecoderSpec()


def nets():
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    enc = fold_encoder_params(init_encoder_params(EncoderSpec(), jax.random.key(1)))
    return dec, enc


def test_probe_exhaustion_counts_overflow():
    """Load factor ~0.6 with 8 linear probes must drop some keys and count
    them, never corrupt the table."""
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=256, table_size=256, n_probes=8)
    state = H.create_hash_map_state(cfg)
    rng = np.random.default_rng(3)
    cells = np.unique(rng.integers(-50, 50, (170, 3)).astype(np.int32), axis=0)
    state, pos = H.insert(cfg, state, jnp.asarray(cells), jnp.ones(len(cells), bool))
    pos = np.asarray(pos)
    n_in = (pos >= 0).sum()
    assert n_in == int(state.n_occupied)
    assert int(state.overflow) == len(cells) - n_in
    keys = np.asarray(state.keys)
    assert (keys[pos[pos >= 0]] == cells[pos >= 0]).all()


def test_insert_lookup_roundtrip_with_collisions():
    # load factor ~0.3 (real configs keep the table 4x the slot capacity)
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=512, table_size=512, n_probes=8)
    state = H.create_hash_map_state(cfg)
    rng = np.random.default_rng(0)
    cells = rng.integers(-50, 50, (150, 3)).astype(np.int32)
    cells = np.unique(cells, axis=0)
    state, pos = H.insert(cfg, state, jnp.asarray(cells),
                          jnp.ones(len(cells), bool))
    pos = np.asarray(pos)
    assert (pos >= 0).all()
    assert int(state.n_occupied) == len(cells)
    # every inserted cell resolves to a unique table entry with its key
    assert len(np.unique(pos)) == len(cells)
    keys = np.asarray(state.keys)
    assert (keys[pos] == cells).all()
    # lookup agrees
    found = np.asarray(H.lookup(cfg, state.keys, jnp.asarray(cells)))
    assert (found == pos).all()
    # missing cells return -1
    missing = np.asarray(H.lookup(cfg, state.keys,
                                  jnp.asarray(np.array([[999, 999, 999]], np.int32))))
    assert missing[0] == -1


def test_insert_duplicates_and_reinsert():
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=64, table_size=128)
    state = H.create_hash_map_state(cfg)
    cells = np.array([[1, 2, 3]] * 5 + [[4, 5, 6]] * 3, np.int32)
    state, pos = H.insert(cfg, state, jnp.asarray(cells), jnp.ones(8, bool))
    pos = np.asarray(pos)
    assert int(state.n_occupied) == 2
    assert (pos[:5] == pos[0]).all() and (pos[5:] == pos[5]).all()
    # re-insert is a no-op
    state2, pos2 = H.insert(cfg, state, jnp.asarray(cells), jnp.ones(8, bool))
    assert int(state2.n_occupied) == 2
    assert (np.asarray(pos2) == pos).all()


def test_capacity_overflow_counted():
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=8, table_size=64)
    state = H.create_hash_map_state(cfg)
    cells = np.stack([np.arange(20), np.zeros(20), np.zeros(20)], axis=1).astype(np.int32)
    state, _ = H.insert(cfg, state, jnp.asarray(cells), jnp.ones(20, bool))
    assert int(state.n_occupied) == 8
    assert int(state.overflow) >= 12


def _plane_cloud(n=4000, seed=0, z=0.05):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.8, 0.8, size=(n, 2))
    pts = np.stack([xy[:, 0], xy[:, 1], np.full(n, z)], axis=1).astype(np.float32)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    return jnp.asarray(pts), jnp.asarray(normals)


@pytest.mark.slow
def test_fusion_matches_dense_map():
    """Same cloud fused into the dense and the hash map must produce the same
    latents per cell (shared fusion semantics)."""
    dec, enc = nets()
    pts, nrm = _plane_cloud()
    valid = jnp.ones(pts.shape[0], bool)

    dcfg = M.MapConfig(bound_min=(0.0, 0.0, 0.0), n_xyz=(20, 20, 20),
                       voxel_size=0.1, capacity=4096, prune_min_vox_obs=4,
                       ignore_count_th=2.0, encoder_count_th=600.0)
    # shift the cloud into the dense map's positive octant
    pts_d = pts + 1.0
    dstate = M.integrate_keyframe(dcfg, enc, M.create_map_state(dcfg),
                                  pts_d, nrm, valid)

    hcfg = H.HashMapConfig(voxel_size=0.1, capacity=4096, table_size=1 << 13,
                           prune_min_vox_obs=4, ignore_count_th=2.0,
                           encoder_count_th=600.0)
    hstate = H.integrate_keyframe(hcfg, enc, H.create_hash_map_state(hcfg),
                                  pts_d, nrm, valid)

    # compare latents cell-by-cell
    d_idx = np.asarray(dstate.indexer)
    d_lat = np.asarray(dstate.latents)
    d_cnt = np.asarray(dstate.obs_count)
    h_lat = np.asarray(hstate.latents)
    h_cnt = np.asarray(hstate.obs_count)
    occupied = np.where(d_idx >= 0)[0]
    assert len(occupied) > 50
    cells = np.stack(np.unravel_index(occupied, dcfg.n_xyz), axis=1).astype(np.int32)
    h_slots = np.asarray(H.slot_of(hcfg, hstate, jnp.asarray(cells)))
    assert (h_slots >= 0).all()
    d_slots = d_idx[occupied]
    np.testing.assert_allclose(d_cnt[d_slots], h_cnt[h_slots], rtol=1e-6)
    np.testing.assert_allclose(d_lat[d_slots], h_lat[h_slots], atol=1e-5)
    assert int(dstate.n_occupied) == int(hstate.n_occupied)


def test_query_and_save_load(tmp_path):
    dec, enc = nets()
    pts, nrm = _plane_cloud()
    valid = jnp.ones(pts.shape[0], bool)
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=4096, table_size=1 << 13,
                          prune_min_vox_obs=4, ignore_count_th=2.0)
    state = H.integrate_keyframe(cfg, enc, H.create_hash_map_state(cfg),
                                 pts, nrm, valid)
    sdf, std, ok = H.query_sdf(cfg, dec, SPEC_D, state, pts[:256])
    assert np.asarray(ok).mean() > 0.8
    assert np.isfinite(np.asarray(sdf)).all()
    # far-away query is invalid
    far = jnp.asarray(np.full((4, 3), 100.0, np.float32))
    _, _, ok_far = H.query_sdf(cfg, dec, SPEC_D, state, far)
    assert not np.asarray(ok_far).any()

    H.save_map(str(tmp_path / "m.npz"), cfg, state)
    cfg2, state2 = H.load_map(str(tmp_path / "m.npz"))
    assert cfg2 == cfg
    np.testing.assert_allclose(np.asarray(state2.latents), np.asarray(state.latents))


@pytest.mark.slow
def test_hash_optimize_latents():
    dec, enc = nets()
    cfg = H.HashMapConfig(voxel_size=0.1, capacity=4096, table_size=1 << 13,
                          prune_min_vox_obs=0, ignore_count_th=0.0,
                          encoder_count_th=10.0)
    pts, nrm = _plane_cloud()
    valid = jnp.ones(pts.shape[0], bool)
    state = H.integrate_keyframe(cfg, enc, H.create_hash_map_state(cfg),
                                 pts, nrm, valid)
    slot_ids, rel, gt, mask = H.build_optimize_samples(
        cfg, state, pts, nrm, valid, jax.random.key(0))
    assert int(mask.sum()) > 0

    from difusion_tpu.models.decoder import decode

    def nll(latents):
        lat = latents[jnp.clip(slot_ids, 0, cfg.capacity - 1)]
        sdf, std = decode(dec, H.DecoderSpec(), lat, rel)
        pd, g = jnp.clip(sdf, -0.2, 0.2), jnp.clip(gt, -0.2, 0.2)
        ll = 0.5 * ((g - pd) / std) ** 2 + jnp.log(std)
        return float(jnp.sum(ll * mask) / jnp.maximum(mask.sum(), 1))

    before = nll(state.latents)
    state2 = H.optimize_latents(cfg, dec, H.DecoderSpec(), state,
                                slot_ids, rel, gt, mask, n_iters=10)
    assert nll(state2.latents) < before
    assert bool(jnp.any(state2.optimized))


def test_mesh_prep_soak_20k():
    """_mesh_prep_hash (device-side dirty-block resolution) must match a
    dict reference over 20k+ occupied voxels -- it replaces the round-2
    host-side join, which synced full-capacity arrays every extract
    (VERDICT round 2, item 5)."""
    from difusion_tpu.core import hash_map as HM
    from difusion_tpu.core.meshing import _dilate6_cells, _mesh_prep_hash

    rng = np.random.default_rng(5)
    n_occ = 20000
    cfg = HM.HashMapConfig(voxel_size=0.1, latent_dim=4, capacity=1 << 15,
                           table_size=1 << 17, ignore_count_th=1.0)
    # synthetic occupied set: unique random cells incl. negatives, inserted
    # through the real hash path (the prep probes the table)
    cells = rng.integers(-60, 60, size=(n_occ * 2, 3)).astype(np.int32)
    cells = np.unique(cells, axis=0)[:n_occ]
    n_occ = len(cells)
    state = HM.create_hash_map_state(cfg)
    state, _ = HM.insert(cfg, state, jnp.asarray(cells),
                         jnp.ones(n_occ, bool))
    assert int(state.n_occupied) == n_occ
    # insertion order == slot order for a fresh table
    slot_of_cell = {tuple(c): s for s, c in enumerate(
        np.asarray(state.slot_cell[:n_occ]))}

    obs = np.zeros(cfg.capacity, np.float32)
    obs[:n_occ] = rng.uniform(0.5, 50.0, n_occ)   # some below ignore_count_th
    dirty = np.zeros(cfg.capacity, bool)
    dirty[rng.choice(n_occ, 3000, replace=False)] = True
    state = state._replace(obs_count=jnp.asarray(obs),
                           mesh_dirty=jnp.asarray(dirty))

    got_cells, got_slots, count = _mesh_prep_hash(cfg, state, False)
    n = int(count)
    got = {tuple(c): int(s) for c, s in zip(np.asarray(got_cells[:n]),
                                            np.asarray(got_slots[:n]))}

    # dict reference over the dilated dirty set
    dirty_cells = np.asarray(state.slot_cell)[np.where(dirty)[0]]
    want = {}
    for c in _dilate6_cells(dirty_cells.astype(np.int64)):
        s = slot_of_cell.get(tuple(c))
        if s is not None and obs[s] > cfg.ignore_count_th:
            want[tuple(c)] = s
    assert got == want
