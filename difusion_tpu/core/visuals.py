"""Map debug visuals (parity with reference ``get_fast_preview_visuals`` /
``get_map_visuals``, pytorch/system/map.py:725-832).

The reference renders Open3D geometry into its GUI; here the same data comes
back as plain numpy (block boxes, SDF/uncertainty point samples) plus PLY
export helpers -- the offline equivalent of the debug overlays.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderSpec, decode
from ..ops.sampling import get_samples
from . import hash_map as HM


class MapVisuals(NamedTuple):
    block_starts: Optional[np.ndarray] = None    # (B, 3) world coords
    block_size: float = 0.0
    bound_min: Optional[np.ndarray] = None
    bound_max: Optional[np.ndarray] = None
    sample_xyz: Optional[np.ndarray] = None      # (S, 3)
    sample_sdf: Optional[np.ndarray] = None      # (S,) normalized [0, 1]
    sample_std: Optional[np.ndarray] = None      # (S,) normalized [0, 1]


def _occupied_cells(cfg, state) -> Tuple[np.ndarray, np.ndarray]:
    """-> (cells (B, 3) int, slots (B,)) of confident occupied voxels."""
    if isinstance(cfg, HM.HashMapConfig):
        n = int(state.n_occupied)
        cells = np.asarray(state.slot_cell[:n])
        slots = np.arange(n)
    else:
        occupied = np.where(np.asarray(state.indexer) >= 0)[0]
        slots = np.asarray(state.indexer)[occupied]
        nx, ny, nz = cfg.n_xyz
        cells = np.stack([occupied // (ny * nz), (occupied // nz) % ny,
                          occupied % nz], axis=1)
    counts = np.asarray(state.obs_count)
    keep = counts[slots] > cfg.ignore_count_th
    return cells[keep], slots[keep]


def _world_origin(cfg) -> np.ndarray:
    if isinstance(cfg, HM.HashMapConfig):
        return np.zeros(3, np.float32)
    return np.asarray(cfg.bound_min, np.float32)


def get_fast_preview_visuals(cfg, state) -> MapVisuals:
    """Occupied-block wireframe data (reference map.py:725-749)."""
    cells, _ = _occupied_cells(cfg, state)
    starts = cells * cfg.voxel_size + _world_origin(cfg)[None, :]
    bmin = bmax = None
    if not isinstance(cfg, HM.HashMapConfig):
        bmin = np.asarray(cfg.bound_min, np.float32)
        bmax = np.asarray(cfg.bound_max, np.float32)
    return MapVisuals(block_starts=starts.astype(np.float32),
                      block_size=cfg.voxel_size, bound_min=bmin, bound_max=bmax)


def get_map_visuals(cfg, dec_params, spec: DecoderSpec, state,
                    voxel_resolution: int = 8,
                    sample_range: Optional[list] = None) -> MapVisuals:
    """Dense SDF/uncertainty samples over occupied voxels
    (reference map.py:751-832)."""
    cells, slots = _occupied_cells(cfg, state)
    if len(cells) == 0:
        return get_fast_preview_visuals(cfg, state)
    r = voxel_resolution
    lattice = np.asarray(get_samples(r)) - 0.5                 # (r^3, 3)
    latents = np.asarray(state.latents)[slots]                 # (B, L)
    B, K = len(cells), lattice.shape[0]
    lat = jnp.asarray(np.repeat(latents, K, axis=0))
    xyz = jnp.asarray(np.tile(lattice, (B, 1)).astype(np.float32))
    sdf, std = decode(dec_params, spec, lat, xyz)
    sdf = np.asarray(sdf)
    std = np.asarray(std)

    pos = (cells[:, None, :] + (lattice + 0.5)[None]) * cfg.voxel_size \
        + _world_origin(cfg)[None, None, :]
    pos = pos.reshape(-1, 3).astype(np.float32)

    if sample_range is None:
        lo, hi = sdf.min(), sdf.max()
        vis_sdf = (sdf - lo) / max(hi - lo, 1e-12)
        vis_std = (std - std.min()) / max(std.max() - std.min(), 1e-12)
    else:
        vis_sdf = np.clip((sdf - sample_range[0])
                          / (sample_range[1] - sample_range[0]), 0, 1)
        vis_std = np.clip((std - sample_range[0])
                          / (sample_range[1] - sample_range[0]), 0, 1)

    base = get_fast_preview_visuals(cfg, state)
    return base._replace(sample_xyz=pos, sample_sdf=vis_sdf, sample_std=vis_std)


def write_pointcloud_ply(path: str, xyz: np.ndarray, cfloat: np.ndarray):
    """Colored point-cloud PLY (jet colormap over cfloat in [0, 1]) -- the
    offline stand-in for vis_util.pointcloud (utils/vis_util.py)."""
    import struct

    import matplotlib.cm as cm
    colors = (cm.jet(np.clip(cfloat, 0, 1))[:, :3] * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write((
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n").encode())
        for p, c in zip(xyz, colors):
            f.write(struct.pack("<fffBBB", p[0], p[1], p[2], c[0], c[1], c[2]))
