"""Sampler/generator tests: primitive mesh sanity, z-buffer visibility,
SDF accuracy against analytic shapes, and the end-to-end LIF generation ->
training pipeline (BASELINE config-5 analog; capability parity with
pytorch/sampler_cuda + dataset/training/main_generator.py)."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from difusion_tpu.config import dict_to_args
from difusion_tpu.sampler import mesh_io, generator
from difusion_tpu.sampler.sampler import (SamplerConfig, compute_sdf,
                                          equidist_points_on_sphere,
                                          generate_mesh_samples,
                                          sample_on_triangles,
                                          visible_surface_samples)
from difusion_tpu.utils.motion import Isometry


def _watertight(mesh):
    edges = np.concatenate([mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]],
                            mesh.faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return (counts == 2).all()


@pytest.mark.parametrize("mesh,center", [
    (mesh_io.make_box(1.0, 0.8, 1.2), np.array([0.5, 0.4, 0.6])),
    (mesh_io.make_sphere(0.5, 16), np.zeros(3)),
    (mesh_io.make_cylinder(0.4, 1.0, 24), np.zeros(3)),
])
def test_primitives_outward_watertight(mesh, center):
    assert _watertight(mesh)
    normals = mesh.face_normals()
    centroids = mesh.vertices[mesh.faces].mean(axis=1)
    out = np.sum(normals * (centroids - center), axis=1)
    assert (out > -1e-6).all(), out.min()


def test_obj_roundtrip(tmp_path):
    mesh = mesh_io.make_box()
    mesh_io.save_obj(str(tmp_path / "m.obj"), mesh)
    m2 = mesh_io.load_mesh(str(tmp_path / "m.obj"))
    assert np.allclose(m2.vertices, mesh.vertices)
    assert (m2.faces == mesh.faces).all()


def test_area_weighted_sampling():
    mesh = mesh_io.make_box(2.0, 1.0, 1.0)
    rng = np.random.default_rng(0)
    pts, tri = sample_on_triangles(mesh, 20000, rng)
    # every point must lie on the box surface
    on_face = ((np.isclose(pts[:, 0], 0, atol=1e-5)) | (np.isclose(pts[:, 0], 2, atol=1e-5))
               | (np.isclose(pts[:, 1], 0, atol=1e-5)) | (np.isclose(pts[:, 1], 1, atol=1e-5))
               | (np.isclose(pts[:, 2], 0, atol=1e-5)) | (np.isclose(pts[:, 2], 1, atol=1e-5)))
    assert on_face.all()
    # area weighting: the two 2x1 z-faces are twice as likely as the 1x1 x-faces
    z_faces = np.isclose(pts[:, 2], 0, atol=1e-5) | np.isclose(pts[:, 2], 1, atol=1e-5)
    x_faces = np.isclose(pts[:, 0], 0, atol=1e-5) | np.isclose(pts[:, 0], 2, atol=1e-5)
    assert 1.6 < z_faces.sum() / x_faces.sum() < 2.4


def _sphere_cams(n=60, dist=1.5):
    return [Isometry.look_at(p * dist, np.zeros(3))
            for p in equidist_points_on_sphere(n)]


def test_visibility_culls_interior():
    """An inner sphere nested in an outer sphere must be invisible."""
    outer = mesh_io.make_sphere(0.5, 24)
    inner = mesh_io.make_sphere(0.2, 16)
    verts = np.concatenate([outer.vertices, inner.vertices])
    faces = np.concatenate([outer.faces, inner.faces + len(outer.vertices)])
    mesh = mesh_io.TriMesh(verts, faces.astype(np.int32))
    rng = np.random.default_rng(1)
    pts, nrm = visible_surface_samples(mesh, _sphere_cams(), 0.8, 40000, rng,
                                       res=200)
    r = np.linalg.norm(pts, axis=1)
    assert (r > 0.4).mean() > 0.999, (r < 0.4).mean()
    assert len(pts) > 10000
    # normals point outward
    assert (np.sum(nrm * pts, axis=1) > 0).mean() > 0.99


@pytest.mark.slow
def test_sdf_matches_analytic_sphere():
    mesh = mesh_io.make_sphere(0.5, 32)
    rng = np.random.default_rng(2)
    cfg = SamplerConfig(num_sample=20000, n_surface_candidates=100000,
                        zbuffer_res=200)
    data, surface = generate_mesh_samples(mesh, _sphere_cams(), 0.8, cfg, rng)
    assert len(data) > 15000          # few ambiguous votes on a smooth shape
    assert len(surface) > 10000
    analytic = np.linalg.norm(data[:, :3], axis=1) - 0.5
    err = np.abs(data[:, 3] - analytic)
    assert np.percentile(err, 95) < 0.01, np.percentile(err, 95)
    # both signs present (near-surface perturbation straddles the surface)
    assert (data[:, 3] > 0).mean() > 0.2
    assert (data[:, 3] < 0).mean() > 0.1


def test_compute_sdf_ref_bucketing():
    """Reference clouds are padded to pow2 buckets so the chunk kernel
    compiles once per bucket, not once per mesh (the remote-compile service
    prices a retrace in minutes).  Two different ref sizes in one bucket
    must share a trace, and padding must not perturb the votes."""
    from difusion_tpu.sampler.sampler import _sdf_chunk
    rng = np.random.default_rng(7)
    ref = rng.standard_normal((1500, 3)).astype(np.float32)
    nrm = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    q = rng.standard_normal((500, 3)).astype(np.float32) * 0.5
    before = _sdf_chunk._cache_size()
    a = compute_sdf(q, ref, nrm, stdv=0.07, chunk=512)
    mid = _sdf_chunk._cache_size()
    b = compute_sdf(q, ref[:1200], nrm[:1200], stdv=0.07, chunk=512)
    assert _sdf_chunk._cache_size() == mid > before   # same 2048 bucket
    # exact-bucket-size ref (no padding) agrees with a padded superset that
    # contains the same nearest neighbours
    far = np.full((548, 3), 50.0, np.float32)
    c = compute_sdf(q, np.concatenate([ref, far]),
                    np.concatenate([nrm, nrm[:548]]), stdv=0.07, chunk=512)
    np.testing.assert_array_equal(a, c)
    assert np.isfinite(b[~np.isnan(b)]).all()


def test_compute_sdf_ref_tiling_matches_single_pass(monkeypatch):
    """Large reference clouds run the scanned REF_TILE top-k merge (the
    single-pass (Q, R) distance slab OOMs HBM at R ~ 512k: 16 GiB at
    Q = 8192).  The merge must be bit-identical to the single pass,
    including NaN ambiguous-vote positions and tie resolution."""
    from difusion_tpu.sampler import sampler as S
    rng = np.random.default_rng(11)
    ref = rng.standard_normal((5000, 3)).astype(np.float32)
    nrm = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    q = rng.standard_normal((700, 3)).astype(np.float32) * 0.5
    monkeypatch.setattr(S, "REF_TILE", 2048)   # 5000 -> 4 tiles (8192 pad)
    S._sdf_chunk.clear_cache()
    tiled = S.compute_sdf(q, ref, nrm, stdv=0.07, chunk=512)
    monkeypatch.setattr(S, "REF_TILE", 1 << 20)
    S._sdf_chunk.clear_cache()
    single = S.compute_sdf(q, ref, nrm, stdv=0.07, chunk=512)
    S._sdf_chunk.clear_cache()
    np.testing.assert_array_equal(np.isnan(tiled), np.isnan(single))
    m = ~np.isnan(tiled)
    np.testing.assert_array_equal(tiled[m], single[m])


@pytest.mark.slow
def test_height_field_provider(tmp_path):
    """The open-sheet data-free provider: consistent mesh topology/normals,
    and run_generation accepts it end-to-end into LIF payloads."""
    gen = generator.HeightFieldGenerator(n_shapes=3, seed=7, grid=24)
    mesh, (cam_scale, cams), scale = gen[0]
    g = 24
    assert mesh.vertices.shape == (g * g, 3)
    assert mesh.faces.shape == (2 * (g - 1) ** 2, 3)
    n = mesh.face_normals()
    assert np.isfinite(n).all()
    # sheet is smooth: adjacent face normals nearly parallel (winding is
    # consistent, so the sign vote sees one coherent side)
    assert float(np.sum(n[0] * n[1])) > 0.5
    assert len(cams) == 100 and scale == 1.0
    # deterministic rebuild per index
    m2 = generator.HeightFieldGenerator(n_shapes=3, seed=7, grid=24)[0][0]
    assert np.array_equal(mesh.vertices, m2.vertices)

    args = dict_to_args(dict(
        provider="height_field",
        provider_kwargs=dict(n_shapes=2, seed=7, grid=32),
        output=str(tmp_path / "hf_lifs"),
        sampler_count=20000, sampler_var=0.005,
        voxel_size=0.4, nn_size=2.0, seed=4,
    ))
    cfg = SamplerConfig(num_sample=20000, n_surface_candidates=60000,
                        zbuffer_res=200)
    n_lifs = generator.run_generation(args, cfg)
    assert n_lifs > 3
    from difusion_tpu.train import lif_dataset as ldata
    ds = ldata.LifDataset(str(tmp_path / "hf_lifs"), num_sample=128,
                          num_surface_sample=64)
    samples, surf = ds[0]
    assert samples.shape == (128, 4) and surf.shape == (64, 6)
    assert np.isfinite(samples).all() and np.isfinite(surf).all()


def test_generator_to_training_end_to_end(tmp_path):
    """Config-5 analog: generate LIF payloads from simple shapes, then run
    train steps on them (sampler -> generator -> dataset -> trainer)."""
    args = dict_to_args(dict(
        provider="simple_shape",
        provider_kwargs=dict(n_shapes=2, seed=3),
        output=str(tmp_path / "lifs"),
        sampler_count=20000,
        sampler_var=0.005,
        voxel_size=0.4,
        nn_size=2.0,
        seed=4,
    ))
    cfg = SamplerConfig(num_sample=20000, n_surface_candidates=60000,
                        zbuffer_res=200)
    n_lifs = generator.run_generation(args, cfg)
    assert n_lifs > 3

    from difusion_tpu.train import lif_dataset as ldata
    from difusion_tpu.train import trainer as TR
    from difusion_tpu.train.losses import LossConfig
    from difusion_tpu.models.decoder import DecoderSpec
    from difusion_tpu.models.encoder import EncoderSpec

    ds = ldata.LifDataset(str(tmp_path / "lifs"), num_sample=128,
                          num_surface_sample=64, augment_rotation="Y")
    samples, surf = ds[0]
    assert samples.shape == (128, 4) and surf.shape == (64, 6)
    # voxel-local coords: |xyz|_inf <= 1 (nn_size=2 chebyshev window), up to
    # sqrt(2) after the Y-rotation augmentation
    assert np.abs(samples[:, :3]).max() <= np.sqrt(2.0) + 0.01

    state = TR.create_train_state(DecoderSpec(), EncoderSpec(), jax.random.key(0))
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    losses0 = losses1 = None
    for step in range(10):
        batch = [ds[int(i)] for i in rng.integers(0, len(ds), 4)]
        sdf = jnp.asarray(np.stack([b[0] for b in batch]))
        sf = jnp.asarray(np.stack([b[1] for b in batch]))
        key, sub = jax.random.split(key)
        state, losses = TR.train_step(DecoderSpec(), LossConfig(), state, sdf,
                                      sf, sub, jnp.float32(1e-3),
                                      jnp.float32(1e-3), jnp.float32(1.0))
        if step == 0:
            losses0 = float(losses["total"])
    assert float(losses["total"]) < losses0


@pytest.mark.slow
def test_shapenet_generator_mock_tree(tmp_path):
    """ShapeNetGenerator over a mock ShapeNetCore.v2 layout (BASELINE
    config-5's named provider; reference shapenet_model.py:11-78):
    <category>/<id>/models/model_normalized.obj + a valid-list json,
    through run_generation to LIF payloads a LifDataset can consume."""
    root = tmp_path / "ShapeNetCore.v2"
    meshes = {"02691156": [("m0", mesh_io.make_box(0.9, 0.7, 1.1)),
                           ("m1", mesh_io.make_sphere(0.5, 24))],
              "03001627": [("c0", mesh_io.make_cylinder(0.4, 1.0, 32))]}
    for cat, items in meshes.items():
        for mid, mesh in items:
            mdir = root / cat / mid / "models"
            mdir.mkdir(parents=True)
            # center like the real assets (model_normalized)
            lo, hi = mesh.bounds()
            mesh = mesh_io.TriMesh(mesh.vertices - (lo + hi) / 2.0, mesh.faces)
            mesh_io.save_obj(str(mdir / "model_normalized.obj"), mesh)
    valid = {"ShapeNetV2": {"02691156": ["m0", "m1"], "03001627": ["c0"]}}
    (tmp_path / "valid.json").write_text(json.dumps(valid))

    gen = generator.ShapeNetGenerator(
        shapenet_path=str(root), categories=["02691156", "03001627"],
        shapes_per_category=[2, -1], scale=[0.6, 0.5],
        valid_list_path=str(tmp_path / "valid.json"))
    assert len(gen) == 3
    path, (half_window, cams), scale = gen[0]
    assert path.endswith("models/model_normalized.obj")
    assert half_window == 0.8 and len(cams) == 300
    assert scale == 0.6

    args = dict_to_args(dict(
        provider="shapenet_model",
        provider_kwargs=dict(shapenet_path=str(root),
                             categories=["02691156", "03001627"],
                             shapes_per_category=[1, 1], scale=[0.6, 0.5],
                             valid_list_path=str(tmp_path / "valid.json")),
        output=str(tmp_path / "lifs"), sampler_count=20000,
        sampler_var=0.005, voxel_size=0.25, nn_size=2.0, seed=4))
    cfg = SamplerConfig(num_sample=20000, n_surface_candidates=60000,
                        zbuffer_res=160)
    n_lifs = generator.run_generation(args, cfg)
    assert n_lifs > 3

    from difusion_tpu.train import lif_dataset as ldata
    ds = ldata.LifDataset(str(tmp_path / "lifs"), num_sample=64,
                          num_surface_sample=32)
    samples, surf = ds[0]
    assert samples.shape == (64, 4) and surf.shape == (32, 6)
    src = json.loads((tmp_path / "lifs" / "source.json").read_text())
    assert len(src) == n_lifs
    assert any("02691156" in s[0] for s in src)


@pytest.mark.slow
def test_reference_methods_2_and_3():
    """Sampler reference modes (PreprocessMesh -r): 2 = raw mesh-normal
    cloud, 3 = external reference points."""
    mesh = mesh_io.make_sphere(0.5, 32)
    rng = np.random.default_rng(5)
    cfg2 = SamplerConfig(reference_method=2, num_sample=10000,
                         n_surface_candidates=60000)
    data2, surf2 = generate_mesh_samples(mesh, [], 0.0, cfg2, rng)
    analytic = np.linalg.norm(data2[:, :3], axis=1) - 0.5
    assert np.percentile(np.abs(data2[:, 3] - analytic), 95) < 0.01

    # method 3: analytic sphere cloud as the external reference
    dirs = rng.normal(size=(50000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = np.concatenate([0.5 * dirs, dirs], axis=1).astype(np.float32)
    cfg3 = SamplerConfig(reference_method=3, num_sample=10000)
    data3, surf3 = generate_mesh_samples(mesh, [], 0.0, cfg3, rng,
                                         reference_points=ref)
    analytic = np.linalg.norm(data3[:, :3], axis=1) - 0.5
    assert np.percentile(np.abs(data3[:, 3] - analytic), 95) < 0.01
    assert len(surf3) == len(ref)
