"""Incremental mesh extraction driver.

Orchestrates the reference ``extract_mesh`` flow (pytorch/system/map.py:581-723)
around the TPU marching-cubes kernel: find dirty blocks, expand by the
6-neighborhood, evaluate the decoder on each block's ``2r`` lattice, run sparse
MC, and splice the result into a host-side triangle-soup cache (replacing the
numba ``_get_valid_idx`` splice, map.py:20-26, 701-714).  The cache is keyed
by latent SLOT id, which is stable for both map backends.

Two backends share the driver:

* :class:`MeshExtractor` -- dense-indexer map (bounded scenes).
* :class:`HashMeshExtractor` -- hash-indexed map: each extraction builds a
  temporary dense sub-grid over the bounding box of the involved cells, so
  the same static-shape MC kernel runs unchanged (the sub-grid is a few
  hundred KB of int32 on the worst frames).

Block batches are padded to power-of-two buckets so the jitted kernel compiles
a handful of times, not per frame.  The reference's hierarchical coarse-to-fine
"fast" evaluation (map.py:644-682) is reproduced in static-shape form
(:func:`_eval_and_negate_fast`): coarse r^3 decode, align-corners trilinear
upsample as three MXU matmuls, then exact re-evaluation of each block's
``refine_k`` most-near-surface sites (the reference's dynamic |sdf| < 0.05
set becomes a per-block top-k budget).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderSpec, decode
from ..ops.marching_cubes import marching_cubes_sparse, mc_triangles_np
from ..ops.sampling import block_lattice, get_samples
from . import hash_map as HM
from . import map as M


@partial(jax.jit, static_argnames=("spec", "r"))
def _eval_and_negate(dec_params, spec: DecoderSpec, latents: jnp.ndarray, r: int):
    """Decode the (2r)^3 lattice for each block; negate like reference
    map.py:687 (MC inside/outside convention)."""
    B = latents.shape[0]
    lattice = block_lattice(r)                       # (K, 3)
    K = lattice.shape[0]
    lat = jnp.broadcast_to(latents[:, None, :], (B, K, latents.shape[1])).reshape(B * K, -1)
    xyz = jnp.broadcast_to(lattice[None], (B, K, 3)).reshape(B * K, 3)
    sdf, std = decode(dec_params, spec, lat, xyz)
    side = 2 * r
    return (-sdf).reshape(B, side, side, side), std.reshape(B, side, side, side)


def _align_corners_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) 1-D linear-interpolation matrix with align_corners=True
    endpoints (torch ``F.interpolate(mode='trilinear', align_corners=True)``
    semantics used by the reference fast path, map.py:657-663).  Applying it
    along each axis IS trilinear upsampling -- and on TPU it runs as three
    small matmuls on the MXU."""
    t = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    j0 = np.minimum(t.astype(np.int64), n_in - 2)
    w = t - j0
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), j0] = 1.0 - w
    m[np.arange(n_out), j0 + 1] = w
    return jnp.asarray(m)


@partial(jax.jit, static_argnames=("spec", "r", "refine_k"))
def _eval_and_negate_fast(dec_params, spec: DecoderSpec, latents: jnp.ndarray,
                          r: int, refine_k: int):
    """Hierarchical coarse-to-fine lattice evaluation (reference "fast" mode,
    map.py:644-682): decode the coarse r^3 lattice, trilinearly upsample to
    (2r)^3 (align-corners, as matmuls), then re-evaluate exactly the
    ``refine_k`` most-near-surface sites per block.

    The reference refines every site with |sdf| < 0.05; on TPU the refine set
    must be static, so each block refines its ``refine_k`` smallest-|sdf|
    sites instead -- a superset of the near-surface set whenever the block's
    near-surface population fits the budget, and the closest-to-surface
    subset otherwise.  Decoder evals per block: r^3 + refine_k, vs (2r)^3
    dense."""
    B, L = latents.shape
    side = 2 * r
    F = side ** 3
    # coarse lattice: r^3 over the same extent (map.py:644-646)
    sample_a = -(r // 2) * (1.0 / r)
    sample_b = 1.0 + ((r - 1) // 2) * (1.0 / r)
    coarse = get_samples(r, a=sample_a, b=sample_b) - 0.5      # (r^3, 3)
    lat_c = jnp.broadcast_to(latents[:, None, :], (B, r ** 3, L)).reshape(-1, L)
    xyz_c = jnp.broadcast_to(coarse[None], (B, r ** 3, 3)).reshape(-1, 3)
    sdf_c, std_c = decode(dec_params, spec, lat_c, xyz_c)
    sdf_c = sdf_c.reshape(B, r, r, r)
    std_c = std_c.reshape(B, r, r, r)

    m = _align_corners_matrix(side, r)                # (2r, r)
    def up(vol):
        vol = jnp.einsum("xa,Bayz->Bxyz", m, vol)
        vol = jnp.einsum("yb,Bxbz->Bxyz", m, vol)
        return jnp.einsum("zc,Bxyc->Bxyz", m, vol)
    sdf_f = up(sdf_c).reshape(B, F)
    std_f = up(std_c).reshape(B, F)

    # per-block static refine set: the refine_k smallest |interpolated sdf|
    _, idx = jax.lax.top_k(-jnp.abs(sdf_f), refine_k)           # (B, K)
    fine = block_lattice(r)                                     # (F, 3)
    xyz_r = fine[idx.reshape(-1)]                               # (B*K, 3)
    lat_r = jnp.broadcast_to(latents[:, None, :],
                             (B, refine_k, L)).reshape(-1, L)
    sdf_r, std_r = decode(dec_params, spec, lat_r, xyz_r)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], idx.shape)
    sdf_f = sdf_f.at[rows, idx].set(sdf_r.reshape(B, refine_k))
    std_f = std_f.at[rows, idx].set(std_r.reshape(B, refine_k))
    return (-sdf_f).reshape(B, side, side, side), \
        std_f.reshape(B, side, side, side)


def _next_bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _dilate6_cells(cells: np.ndarray) -> np.ndarray:
    """Unique 6-neighborhood expansion of (K, 3) integer cells."""
    offs = np.array([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.int64)
    out = (cells[:, None, :] + offs[None]).reshape(-1, 3)
    return np.unique(out, axis=0)


class _MeshExtractorBase:
    """Shared cache + MC driving; subclasses resolve cells/slots."""

    def __init__(self, dec_params: Dict, spec: DecoderSpec,
                 voxel_resolution: int = 4, max_triangles: int = 1 << 20,
                 interpolate: bool = True, fast: bool = False,
                 refine_fraction: float = 0.2):
        self.dec_params = dec_params
        self.spec = spec
        self.r = int(voxel_resolution)
        self.max_triangles = int(max_triangles)
        self.interpolate = interpolate
        # hierarchical coarse-to-fine evaluation (reference fast=True,
        # map.py:644-682): refine_k = refine_fraction * (2r)^3 sites/block
        self.fast = fast
        self.refine_k = max(int(refine_fraction * (2 * self.r) ** 3), 8)
        self.clear_cache()

    # -- cache ---------------------------------------------------------------
    def clear_cache(self):
        self._tris = np.zeros((0, 3, 3), np.float32)
        self._std = np.zeros((0, 3), np.float32)
        self._slot = np.zeros((0,), np.int64)

    def triangles(self) -> Tuple[np.ndarray, np.ndarray]:
        """Triangle soup: (T, 3, 3) world-space vertices, (T, 3) stds."""
        return self._tris, self._std

    def vertices_faces(self) -> Tuple[np.ndarray, np.ndarray]:
        verts = self._tris.reshape(-1, 3)
        faces = np.arange(verts.shape[0]).reshape(-1, 3)
        return verts, faces

    # -- subclass hooks --------------------------------------------------------
    def _dirty_cells_slots(self, state, no_cache: bool):
        """-> (cells (K, 3) int64, slots (K,) int) to re-mesh, after
        6-neighborhood expansion and confidence filtering."""
        raise NotImplementedError

    def _local_grid(self, state, cells, slots):
        """-> (indexer (n_local,), n_xyz_local, origin_cell (3,))."""
        raise NotImplementedError

    def _clear_dirty(self, state):
        return state._replace(mesh_dirty=jnp.zeros_like(state.mesh_dirty))

    # -- extraction ----------------------------------------------------------
    def extract(self, state, max_std: float = 2000.0, no_cache: bool = False):
        if no_cache:
            self.clear_cache()
        cells, slots = self._dirty_cells_slots(state, no_cache)
        state = self._clear_dirty(state)
        if len(cells) == 0:
            return state

        indexer, n_xyz_local, origin = self._local_grid(state, cells, slots)
        nxl, nyl, nzl = n_xyz_local
        local = cells - origin[None, :]
        lin_local = (local[:, 0] * nyl * nzl + local[:, 1] * nzl
                     + local[:, 2]).astype(np.int32)

        B = _next_bucket(len(cells))
        valid_blocks = np.full(B, -1, np.int32)
        valid_blocks[:len(cells)] = lin_local
        slot_pad = np.zeros(B, np.int32)
        slot_pad[:len(cells)] = slots

        capacity = state.latents.shape[0]
        slot_to_batch = np.full(capacity + 1, -1, np.int32)
        slot_to_batch[slots] = np.arange(len(cells), dtype=np.int32)

        latents = jnp.asarray(np.asarray(state.latents)[slot_pad])
        if self.fast:
            cube_sdf, cube_std = _eval_and_negate_fast(
                self.dec_params, self.spec, latents, self.r, self.refine_k)
        else:
            cube_sdf, cube_std = _eval_and_negate(self.dec_params, self.spec,
                                                  latents, self.r)
        result = marching_cubes_sparse(
            jnp.asarray(indexer), jnp.asarray(slot_to_batch),
            jnp.asarray(valid_blocks), cube_sdf, cube_std,
            tuple(int(v) for v in n_xyz_local), self.r, self.max_triangles,
            max_std=max_std, interpolate=self.interpolate)

        tris, stds, blocks, count = mc_triangles_np(result)
        if count > self.max_triangles:
            import logging
            logging.warning("marching cubes: triangle budget too small (%d > %d)",
                            count, self.max_triangles)

        # world space: local grid units -> world meters
        tris = (tris + origin[None, None, :].astype(np.float32)) \
            * self.voxel_size + self.world_origin[None, None, :]

        # per-triangle slot for the cache splice
        lin_to_slot = np.full(nxl * nyl * nzl, -1, np.int64)
        lin_to_slot[lin_local] = slots
        tri_slot = lin_to_slot[blocks]

        remeshed = np.zeros(capacity, bool)
        remeshed[slots] = True
        keep_mask = ~remeshed[self._slot] if len(self._slot) else np.zeros(0, bool)
        self._tris = np.concatenate([self._tris[keep_mask], tris])
        self._std = np.concatenate([self._std[keep_mask], stds])
        self._slot = np.concatenate([self._slot[keep_mask], tri_slot])
        return state

    # -- export --------------------------------------------------------------
    def write_obj(self, path: str):
        verts, faces = self.vertices_faces()
        with open(path, "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for face in faces + 1:
                f.write(f"f {face[0]} {face[1]} {face[2]}\n")

    def write_ply(self, path: str, std_range: Optional[Tuple[float, float]] = None):
        """Binary PLY with per-vertex uncertainty color (jet colormap), the
        reference's std visualization (map.py:530-541)."""
        verts, faces = self.vertices_faces()
        stds = self._std.reshape(-1)
        if len(stds):
            lo, hi = std_range if std_range is not None else (stds.min(), stds.max())
            t = np.clip((stds - lo) / max(hi - lo, 1e-12), 0.0, 1.0)
            import matplotlib.cm as cm
            colors = (cm.jet(t)[:, :3] * 255).astype(np.uint8)
        else:
            colors = np.zeros((0, 3), np.uint8)
        import struct
        with open(path, "wb") as f:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            )
            f.write(header.encode())
            for v, c in zip(verts, colors):
                f.write(struct.pack("<fffBBB", v[0], v[1], v[2], c[0], c[1], c[2]))
            for face in faces:
                f.write(struct.pack("<Biii", 3, face[0], face[1], face[2]))


class MeshExtractor(_MeshExtractorBase):
    """Dense-indexer backend (bounded scenes)."""

    def __init__(self, cfg: M.MapConfig, dec_params: Dict, spec: DecoderSpec,
                 **kw):
        super().__init__(dec_params, spec, **kw)
        self.cfg = cfg
        self.voxel_size = cfg.voxel_size
        self.world_origin = np.asarray(cfg.bound_min, np.float32)

    def _dirty_cells_slots(self, state: M.MapState, no_cache: bool):
        cfg = self.cfg
        dirty = np.asarray(state.mesh_dirty)
        if no_cache:
            dirty = np.asarray(state.obs_count) > 0
        if not dirty.any():
            return np.zeros((0, 3), np.int64), np.zeros(0, np.int64)
        positions = np.asarray(state.positions)
        indexer = np.asarray(state.indexer)
        obs_count = np.asarray(state.obs_count)

        lin = positions[np.where(dirty)[0]]
        lin = lin[lin >= 0]
        nx, ny, nz = cfg.n_xyz
        cells = np.stack([lin // (ny * nz), (lin // nz) % ny, lin % nz], axis=1)
        cells = _dilate6_cells(cells)
        inb = ((cells >= 0) & (cells < np.array(cfg.n_xyz))).all(axis=1)
        cells = cells[inb]
        lin = cells[:, 0] * ny * nz + cells[:, 1] * nz + cells[:, 2]
        slots = indexer[lin]
        keep = slots >= 0
        cells, slots = cells[keep], slots[keep]
        keep = obs_count[slots] > cfg.ignore_count_th   # reference map.py:631
        return cells[keep], slots[keep].astype(np.int64)

    def _local_grid(self, state, cells, slots):
        # the dense map's own grid IS the local grid
        return (np.asarray(state.indexer, np.int32), self.cfg.n_xyz,
                np.zeros(3, np.int64))


class HashMeshExtractor(_MeshExtractorBase):
    """Hash-map backend: dense sub-grid over the involved cells per extract."""

    def __init__(self, cfg: HM.HashMapConfig, dec_params: Dict,
                 spec: DecoderSpec, **kw):
        super().__init__(dec_params, spec, **kw)
        self.cfg = cfg
        self.voxel_size = cfg.voxel_size
        self.world_origin = np.zeros(3, np.float32)

    @staticmethod
    def _cell_keys(cells: np.ndarray) -> np.ndarray:
        """(K, 3) int cells -> (K,) unique int64 keys (21 bits/axis, offset
        so negative coordinates pack monotonically)."""
        c = cells.astype(np.int64) + (1 << 20)
        return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]

    def _dirty_cells_slots(self, state: HM.HashMapState, no_cache: bool):
        dirty = np.asarray(state.mesh_dirty)
        if no_cache:
            dirty = np.asarray(state.obs_count) > 0
        if not dirty.any():
            return np.zeros((0, 3), np.int64), np.zeros(0, np.int64)
        slot_cell = np.asarray(state.slot_cell)
        obs_count = np.asarray(state.obs_count)
        n_occ = int(state.n_occupied)
        if n_occ == 0:
            return np.zeros((0, 3), np.int64), np.zeros(0, np.int64)

        # sort-merge join dilated-dirty cells against occupied cells (the
        # per-extract Python dict this replaces was the frame-time ceiling at
        # ScanNet map sizes); keys pack the 3 coordinates into one int64
        cells = _dilate6_cells(slot_cell[np.where(dirty)[0]].astype(np.int64))
        occ_keys = self._cell_keys(slot_cell[:n_occ])
        order = np.argsort(occ_keys)
        occ_sorted = occ_keys[order]
        want = self._cell_keys(cells)
        pos = np.searchsorted(occ_sorted, want)
        pos_c = np.minimum(pos, len(occ_sorted) - 1)
        hit = occ_sorted[pos_c] == want
        slots = order[pos_c]
        keep = hit & (obs_count[slots] > self.cfg.ignore_count_th)
        if not keep.any():
            return np.zeros((0, 3), np.int64), np.zeros(0, np.int64)
        return cells[keep], slots[keep].astype(np.int64)

    def _local_grid(self, state, cells, slots):
        lo = cells.min(axis=0) - 1
        hi = cells.max(axis=0) + 2
        n_xyz = tuple(int(v) for v in (hi - lo))
        indexer = np.full(int(np.prod(n_xyz)), -1, np.int32)
        local = cells - lo[None, :]
        lin = local[:, 0] * n_xyz[1] * n_xyz[2] + local[:, 1] * n_xyz[2] + local[:, 2]
        indexer[lin] = slots
        return indexer, n_xyz, lo.astype(np.int64)
