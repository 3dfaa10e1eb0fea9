"""LIF training-data generator (parity with
pytorch/dataset/training/main_generator.py + the mesh providers in
shapenet_model.py / simple_shape.py).

Differences from the reference, by design:

* The CUDA sampler subprocess (main_generator.py:36-52) is an in-process call
  to :mod:`difusion_tpu.sampler.sampler` (the TPU does the heavy lifting, so
  there is no separate binary to shell out to); the per-mesh ``.cam`` /
  ``.raw`` / ``.surf`` temp-file dance disappears.
* Mesh providers build primitives with :mod:`.mesh_io` instead of Open3D.
* The sklearn chebyshev radius queries (main_generator.py:90-98) are kept --
  the voxel split is host-side offline tooling.
"""
from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..utils.motion import Isometry
from . import mesh_io
from .sampler import (SamplerConfig, equidist_points_on_sphere,
                      generate_mesh_samples)


class ShapeNetGenerator:
    """ShapeNetCore.v2 provider (reference shapenet_model.py:11-78)."""

    def __init__(self, shapenet_path, categories, shapes_per_category, scale,
                 valid_list_path: Optional[str] = None, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.data_sources: List[Path] = []
        self.data_scales: List[float] = []
        valid = {}
        if valid_list_path and Path(valid_list_path).exists():
            valid = json.loads(Path(valid_list_path).read_text()).get("ShapeNetV2", {})
        for cat, count, cat_scale in zip(categories, shapes_per_category, scale):
            cat_path = Path(shapenet_path) / cat
            objs = valid.get(cat) or sorted(p.name for p in cat_path.iterdir())
            if count != -1:
                objs = list(rng.choice(objs, size=count, replace=False))
            self.data_sources += [cat_path / o for o in objs]
            self.data_scales += [cat_scale] * len(objs)

    def __len__(self):
        return len(self.data_sources)

    def get_source(self, idx):
        return str(self.data_sources[idx])

    def __getitem__(self, idx):
        obj_path = self.data_sources[idx] / "models" / "model_normalized.obj"
        cams = [Isometry.look_at(p, np.zeros(3))
                for p in equidist_points_on_sphere(300)]
        # (window-half, zmin, zmax) ortho intrinsics (shapenet_model.py:74)
        return str(obj_path), (0.8, cams), self.data_scales[idx]

    def clean(self, idx):
        pass


class SimpleShapeGenerator:
    """Random box/sphere/cylinder provider (reference simple_shape.py:8-117),
    built on :mod:`.mesh_io` primitives instead of Open3D."""

    def __init__(self, n_shapes: int, seed: int = 0):
        self.n_shapes = n_shapes
        self.rng = np.random.default_rng(seed)
        self.translation_range = (-0.5, 0.5)
        self.scale_range = (0.1, 1.5)
        self.kinds = self.rng.integers(0, 3, size=n_shapes)
        self._cache = {}

    def __len__(self):
        return self.n_shapes

    def get_source(self, idx):
        return ["Cube", "Sphere", "Cylinder"][self.kinds[idx]]

    def _build(self, idx) -> mesh_io.TriMesh:
        rng = self.rng
        lo, hi = self.scale_range
        kind = self.kinds[idx]
        if kind == 0:
            mesh = mesh_io.make_box(rng.uniform(lo, hi), rng.uniform(lo, hi),
                                    rng.uniform(lo, hi))
            center = (mesh.vertices.min(0) + mesh.vertices.max(0)) / 2
            mesh = mesh_io.TriMesh(mesh.vertices - center, mesh.faces)
        elif kind == 1:
            mesh = mesh_io.make_sphere(0.5, resolution=40)
            s = np.diag(rng.uniform(lo, hi, 3)).astype(np.float32)
            mesh = mesh_io.TriMesh((mesh.vertices @ s).astype(np.float32), mesh.faces)
        else:
            mesh = mesh_io.make_cylinder(0.5, 1.0, resolution=60)
            s = np.diag(rng.uniform(lo, hi, 3)).astype(np.float32)
            mesh = mesh_io.TriMesh((mesh.vertices @ s).astype(np.float32), mesh.faces)
        tf = Isometry.random(rng)
        tf.t = rng.uniform(*self.translation_range, size=3)
        return mesh.transformed(tf.matrix.astype(np.float32))

    def __getitem__(self, idx):
        mesh = self._build(idx)
        self._cache[idx] = mesh
        lo, hi = mesh.bounds()
        center = (lo + hi) / 2
        cam_scale = max(float(np.linalg.norm(hi - center)) * 1.1, 0.8)
        cams = [Isometry.look_at(p * cam_scale + center, center)
                for p in equidist_points_on_sphere(100)]
        return mesh, (cam_scale, cams), 1.0

    def clean(self, idx):
        self._cache.pop(idx, None)


def generate_samples(idx: int, args, provider, output_base: Path,
                     source_list: list, sampler_cfg: SamplerConfig,
                     rng: np.random.Generator) -> int:
    """Per-mesh pipeline (reference generate_samples,
    main_generator.py:20-156): sample SDF data, split into per-voxel LIFs
    with count/ratio filters, normalize to voxel-local coords, write npz.
    Returns the number of LIFs written."""
    from sklearn.neighbors import NearestNeighbors

    mesh_or_path, (half_window, cams), sampler_mult = provider[idx]
    mesh = (mesh_or_path if isinstance(mesh_or_path, mesh_io.TriMesh)
            else mesh_io.load_mesh(mesh_or_path))

    data_arr, surface_arr = generate_mesh_samples(mesh, cams, half_window,
                                                  sampler_cfg, rng)
    provider.clean(idx)
    if len(data_arr) == 0:
        return 0
    data_arr = data_arr * np.array([sampler_mult] * 3 + [sampler_mult], np.float32)
    surface_arr[:, :3] *= sampler_mult

    voxel_size = args.voxel_size
    nn_size = getattr(args, "nn_size", 2.0)
    data_xyz = data_arr[:, :3]
    data_sdf = data_arr[:, 3]
    surface_xyz = surface_arr[:, :3]

    # voxel split (main_generator.py:90-135)
    voxel_centers = np.unique(np.ceil(data_xyz / voxel_size) - 1, axis=0)
    voxel_centers = (voxel_centers + 0.5) * voxel_size
    nbrs = NearestNeighbors(radius=voxel_size * (nn_size / 2.0),
                            metric="chebyshev").fit(data_xyz)
    lif_indices = nbrs.radius_neighbors(voxel_centers, return_distance=False)
    nbrs_local = NearestNeighbors(radius=voxel_size * 0.5,
                                  metric="chebyshev").fit(data_xyz)
    local_indices = nbrs_local.radius_neighbors(voxel_centers, return_distance=False)
    nbrs_surface = NearestNeighbors(radius=voxel_size * (nn_size / 2.0),
                                    metric="chebyshev").fit(surface_xyz)
    surface_indices = nbrs_surface.radius_neighbors(voxel_centers, return_distance=False)

    payload_dir = output_base / "payload"
    n_written = 0
    for vox_center, lif_index, local_index, surface_index in zip(
            voxel_centers, lif_indices, local_indices, surface_indices):
        if local_index.shape[0] < 50 or surface_index.shape[0] < 50:
            continue
        inner_sdf = data_sdf[lif_index]
        pos_ratio = np.count_nonzero(inner_sdf > 0) / lif_index.shape[0]
        if pos_ratio < 0.1 or pos_ratio > 0.9:
            continue
        vox_min = vox_center - 0.5 * voxel_size
        vox_max = vox_center + 0.5 * voxel_size
        out_data = data_arr[lif_index].copy()
        out_surf = surface_arr[surface_index].copy()
        out_data[:, :3] = (out_data[:, :3] - vox_center) / (vox_max - vox_min)
        out_surf[:, :3] = (out_surf[:, :3] - vox_center) / (vox_max - vox_min)
        out_data[:, 3] /= voxel_size

        lif_id = len(source_list)
        source_list.append([provider.get_source(idx), idx, n_written])
        np.savez(payload_dir / ("%08d.npz" % lif_id),
                 min=vox_min, max=vox_max, data=out_data, surface=out_surf)
        n_written += 1
    return n_written


def run_generation(args, sampler_cfg: Optional[SamplerConfig] = None) -> int:
    """Dataset-level driver (main_generator.py:160-207).  ``args`` follows
    the reference data-shapenet.yaml surface (provider/provider_kwargs/output/
    sampler_count/sampler_var/voxel_size/nn_size)."""
    providers = {
        "simple_shape": SimpleShapeGenerator,
        "shapenet_model": ShapeNetGenerator,
    }
    provider = providers[args.provider](**args.provider_kwargs)
    output_path = Path(args.output)
    if output_path.exists():
        shutil.rmtree(output_path)
    (output_path / "payload").mkdir(parents=True)

    if sampler_cfg is None:
        sampler_cfg = SamplerConfig(
            reference_method=int(getattr(args, "sample_method", 1)),
            num_sample=int(getattr(args, "sampler_count", 500000)),
            variance=float(getattr(args, "sampler_var", 0.005)))

    rng = np.random.default_rng(getattr(args, "seed", 4))
    source_list: list = []
    for idx in range(len(provider)):
        n = generate_samples(idx, args, provider, output_path, source_list,
                             sampler_cfg, rng)
        logging.info("mesh %d (%s): %d LIFs (total %d)", idx,
                     provider.get_source(idx), n, len(source_list))

    (output_path / "source.json").write_text(json.dumps(source_list, indent=2))
    return len(source_list)


def main(argv=None):
    from ..config import ArgumentParserX
    logging.basicConfig(level=logging.INFO)
    parser = ArgumentParserX(add_hyper_arg=True,
                             description="difusion-tpu LIF data generator")
    args = parser.parse_args(argv)
    return run_generation(args)


if __name__ == "__main__":
    main()
