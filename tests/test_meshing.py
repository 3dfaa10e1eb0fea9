"""Mesh-extraction driver tests: chunked evaluation equivalence, bounded
memory at map scale, and host<->device transfer accounting (VERDICT round 2,
items 3 and 5).

A small random-init decoder keeps these fast on the CPU mesh: the driver
mechanics under test (device prep, chunking, cache splice) are independent of
the prior's weights."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from difusion_tpu.core import hash_map as HM
from difusion_tpu.core import map as M
from difusion_tpu.core.meshing import HashMeshExtractor, MeshExtractor
from difusion_tpu.models import (
    DecoderSpec, EncoderSpec, fold_decoder_params, fold_encoder_params,
    init_decoder_params, init_encoder_params,
)

SPEC = DecoderSpec(latent_size=8, dims=(16, 16, 16, 16))


@pytest.fixture(scope="module")
def tiny_nets():
    dec = fold_decoder_params(init_decoder_params(SPEC, jax.random.key(0)))
    enc = fold_encoder_params(init_encoder_params(
        EncoderSpec(latent_size=8), jax.random.key(1)))
    return dec, enc


def _dense_plane_state(enc, latent_dim=8):
    cfg = M.MapConfig(bound_min=(-1.0, -1.0, -1.0), n_xyz=(20, 20, 20),
                      voxel_size=0.1, latent_dim=latent_dim, capacity=4096,
                      prune_min_vox_obs=2, ignore_count_th=1.0,
                      encoder_count_th=600.0)
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.8, 0.8, size=(6000, 2))
    pts = np.stack([xy[:, 0], xy[:, 1],
                    0.05 + 0.05 * np.sin(3 * xy[:, 0])], 1).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (6000, 1))
    state = M.integrate_keyframe(cfg, enc, M.create_map_state(cfg),
                                 jnp.asarray(pts), jnp.asarray(nrm),
                                 jnp.ones(6000, bool))
    # diversify the random decoder's sign pattern so many blocks emit
    state = state._replace(latents=jax.random.normal(
        jax.random.key(9), state.latents.shape) * 0.8)
    return cfg, state


def _sorted_tris(mesher):
    tris, _ = mesher.triangles()
    flat = tris.reshape(len(tris), -1)
    order = np.lexsort(flat.T)
    return flat[order]


@pytest.mark.slow
class TestChunkedEquivalence:
    @pytest.mark.parametrize("fast", [False, True])
    def test_dense_chunked_matches_unchunked(self, tiny_nets, fast):
        """A max_eval_points budget small enough to force many decoder/MC
        chunks must reproduce the single-dispatch mesh exactly."""
        dec, enc = tiny_nets
        cfg, state = _dense_plane_state(enc)

        big = MeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                            max_triangles=1 << 16, fast=fast,
                            max_eval_points=1 << 24)
        big.extract(state, max_std=100.0)

        small = MeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                              max_triangles=1 << 16, fast=fast,
                              max_eval_points=256)   # 4 blocks/eval chunk
        small.extract(state, max_std=100.0)

        a, b = _sorted_tris(big), _sorted_tris(small)
        assert len(a) > 100
        np.testing.assert_allclose(b, a, atol=1e-6)

    def test_hash_chunked_matches_unchunked(self, tiny_nets):
        dec, enc = tiny_nets
        cfg = HM.HashMapConfig(voxel_size=0.1, latent_dim=8, capacity=4096,
                               table_size=1 << 14, prune_min_vox_obs=2,
                               ignore_count_th=1.0, encoder_count_th=600.0)
        rng = np.random.default_rng(1)
        xy = rng.uniform(-0.8, 0.8, size=(6000, 2))
        pts = np.stack([xy[:, 0], xy[:, 1],
                        0.05 * np.cos(4 * xy[:, 1])], 1).astype(np.float32)
        nrm = np.tile(np.array([[0, 0, 1]], np.float32), (6000, 1))
        state = HM.integrate_keyframe(cfg, enc, HM.create_hash_map_state(cfg),
                                      jnp.asarray(pts), jnp.asarray(nrm),
                                      jnp.ones(6000, bool))
        state = state._replace(latents=jax.random.normal(
            jax.random.key(8), state.latents.shape) * 0.8)

        big = HashMeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                                max_triangles=1 << 16,
                                max_eval_points=1 << 24)
        big.extract(state, max_std=100.0)
        small = HashMeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                                  max_triangles=1 << 16, max_eval_points=256)
        small.extract(state, max_std=100.0)

        a, b = _sorted_tris(big), _sorted_tris(small)
        assert len(a) > 100
        np.testing.assert_allclose(b, a, atol=1e-6)


@pytest.mark.slow
def test_scale_full_extract_bounded_memory(tiny_nets):
    """Full no_cache extract of a ~30k-voxel hash map completes with a
    bounded per-dispatch budget (VERDICT round 2, item 3: the round-2 driver
    evaluated ALL blocks in ONE decoder call -- at this scale that is 2M
    lattice sites in a single program; the reference bounds it with
    forward_model(max_sample), network/utility.py:84-117)."""
    dec, _ = tiny_nets
    cfg = HM.HashMapConfig(voxel_size=0.1, latent_dim=8, capacity=1 << 16,
                           table_size=1 << 18, ignore_count_th=1.0)
    # occupy ~30k cells on a spherical shell (a ScanNet-scale surface)
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(250000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    cells = np.unique((np.ceil(dirs * 50.0) - 1).astype(np.int32), axis=0)
    assert len(cells) > 25000, len(cells)
    state = HM.create_hash_map_state(cfg)
    state, _ = HM.insert(cfg, state, jnp.asarray(cells),
                         jnp.ones(len(cells), bool))
    n_occ = int(state.n_occupied)
    # a handful of probe-limit drops at this load factor are fine (counted
    # in state.overflow); the scale is what matters here
    assert n_occ > 25000 and len(cells) - n_occ < 100
    state = state._replace(
        obs_count=jnp.full(cfg.capacity, 40.0),
        latents=jax.random.normal(jax.random.key(3),
                                  (cfg.capacity, 8)) * 0.1)

    mesher = HashMeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                               max_triangles=1 << 21,
                               max_eval_points=1 << 17)
    state = mesher.extract(state, max_std=1e6, no_cache=True)
    tris, _ = mesher.triangles()
    assert len(tris) > 1000
    # transfer accounting: the count scalar + n live (cell, slot) rows + the
    # per-chunk block-id uploads -- NOT the full-capacity state arrays
    # (~7.6 MB of latents at 2^16 x 29 + 1.3 MB of metadata) and NOT the
    # multi-MB sub-grid (scattered on device)
    assert mesher.last_transfer_bytes < 2 * 1024 * 1024, \
        mesher.last_transfer_bytes


def test_sharded_extract_matches_single_device(tiny_nets):
    """shard=True spreads decoder-eval chunks over the 8-device CPU mesh;
    the mesh must match the single-device extract exactly (multi-chip
    offline meshing surface, mesh_tool --shard)."""
    dec, enc = tiny_nets
    cfg, state = _dense_plane_state(enc)
    single = MeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                           max_triangles=1 << 16, max_eval_points=1 << 14)
    single.extract(state, max_std=100.0)
    sharded = MeshExtractor(cfg, dec, SPEC, voxel_resolution=2,
                            max_triangles=1 << 16, max_eval_points=1 << 14,
                            shard=True)
    assert sharded._row_sharding is not None   # 8-device CPU mesh active
    sharded.extract(state, max_std=100.0)
    a, b = _sorted_tris(single), _sorted_tris(sharded)
    assert len(a) > 100
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_dense_transfer_accounting(tiny_nets):
    """Per-extract host traffic for the dense backend stays under 1 MB at
    2^16 capacity (VERDICT round 2, item 5): one scalar + n live rows + the
    per-chunk block-id uploads; latents/indexer/dirty never cross."""
    dec, enc = tiny_nets
    cfg, state = _dense_plane_state(enc)
    cap_cfg = cfg._replace(capacity=1 << 16)
    big_state = M.create_map_state(cap_cfg)
    big_state = big_state._replace(
        indexer=state.indexer, latents=jnp.zeros((1 << 16, 8)).at[:4096].set(state.latents),
        positions=jnp.full((1 << 16,), -1, jnp.int32).at[:4096].set(state.positions),
        obs_count=jnp.zeros((1 << 16,)).at[:4096].set(state.obs_count),
        mesh_dirty=jnp.zeros((1 << 16,), bool).at[:4096].set(state.mesh_dirty),
        n_occupied=state.n_occupied)
    mesher = MeshExtractor(cap_cfg, dec, SPEC, voxel_resolution=2,
                           max_triangles=1 << 16)
    mesher.extract(big_state, max_std=100.0)
    assert len(mesher.triangles()[0]) > 100
    assert mesher.last_transfer_bytes < 1 << 20, mesher.last_transfer_bytes
