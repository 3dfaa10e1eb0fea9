"""Sparse marching cubes with cross-block (sdf, std) interpolation.

Re-expression of the reference CUDA kernel
(pytorch/system/ext/marching_cubes/mc_interp_kernel.cu) as a static-shape,
batched XLA computation:

* Each active block evaluated the decoder on a ``2r`` lattice covering the
  voxel plus a half-voxel margin.  Block-corner values blend the overlapping
  lattices of up to 8 neighboring blocks -- trilinear ramp weights times the
  predicted std ("STD_W_SDF" weighting, mc_interp_kernel.cu:94-184).  A corner
  whose *own-block* sample is missing invalidates its cubes (the ``zero_det``
  rule, mc_interp_kernel.cu:101-181).
* Per-(block, subcell) triangle emission uses the canonical 256-case tables
  (:mod:`difusion_tpu.ops.mc_tables`) and per-vertex std-aware interpolation
  (``sdf_interp``, mc_interp_kernel.cu:187-200), pruning triangles with any
  vertex above ``max_std`` (mc_interp_kernel.cu:304).
* The CUDA atomicAdd triangle queue becomes a prefix-sum compaction into a
  fixed ``max_triangles`` buffer -- same overflow semantics (extra triangles
  dropped, true count reported).

TPU layout discipline: every device array keeps its LARGE axis last.  TPU
tiles the trailing two dims to (8, 128) for f32, so a ``(4M, 3, 3)`` triangle
buffer would pad 57x (8 GB of HBM for 144 MB of data).  Corner/subcell fields
are ``(B, n)`` 2-D, per-vertex coordinates live on a small LEADING axis, and
the output triangle buffer is ``(9, max_triangles)`` -- unpack on the host
with :func:`mc_triangles_np`.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mc_tables import CORNER_OFFSETS, EDGE_CORNERS, TRI_TABLE


class McResult(NamedTuple):
    triangles: jnp.ndarray   # (9, T) f32: rows = vertex*3 + coord, voxel units
    tri_std: jnp.ndarray     # (3, T) f32 per-vertex std
    tri_block: jnp.ndarray   # (T,) int32 linearized block id (-1 padding)
    count: jnp.ndarray       # () int32 total emitted (may exceed T)


def mc_triangles_np(res: McResult) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host-side unpack: (tris (C, 3, 3), stds (C, 3), blocks (C,), count)
    where C = min(count, buffer size).

    The device slice length is rounded UP to the next power of two before
    transfer: a slice program is compiled per distinct length, and the raw
    triangle count differs on every extract -- unbucketed, each incremental
    extract paid a fresh (remote-service) compile of three trivial slice
    programs, which dominated its wall time.  The bucket bounds the compile
    surface to ~log2(budget) programs, cached forever.  The three outputs
    also pack into ONE (13, cb) buffer on device so the extract pays one
    host round trip instead of three (~28 ms each on a tunneled runtime)."""
    count = min(int(res.count), res.triangles.shape[1])
    cap = res.triangles.shape[1]
    cb = 1
    while cb < count:
        cb *= 2
    cb = min(cb, cap)
    packed = np.asarray(_pack_mc_outputs(res.triangles, res.tri_std,
                                         res.tri_block, cb))
    tris = packed[0:9, :count].T.reshape(count, 3, 3)
    stds = packed[9:12, :count].T
    blocks = packed[12, :count].view(np.int32)
    return tris, stds, blocks, int(res.count)


@partial(jax.jit, static_argnames=("cb",))
def _pack_mc_outputs(triangles, tri_std, tri_block, cb: int):
    """(13, cb) f32 download buffer: 9 triangle rows, 3 std rows, the block
    ids bitcast to f32 in row 12 (bit-preserving; the host views them back
    as int32)."""
    blk = jax.lax.bitcast_convert_type(tri_block[:cb], jnp.float32)
    return jnp.concatenate([triangles[:, :cb], tri_std[:, :cb], blk[None]],
                           axis=0)


def _corner_tables(r: int):
    """Per-dim blending tables for corner index c in [0..r]: for the m/p
    samples give (block offset, lattice index, weight) and which of the two is
    the own-block sample (mc_interp_kernel.cu:47-91)."""
    c = np.arange(r + 1)
    rbound = (r - 1) // 2
    rstart = r // 2
    rmid = r / 2.0
    lower = c <= rbound
    off_m = np.where(lower, -1, 0).astype(np.int32)
    idx_m = np.where(lower, c + rstart + r, c + rstart).astype(np.int32)
    w_m = np.where(lower, (rmid - c) / r, (rmid + r - c) / r).astype(np.float32)
    off_p = np.where(lower, 0, 1).astype(np.int32)
    idx_p = np.where(lower, c + rstart, c + rstart - r).astype(np.int32)
    w_p = np.where(lower, (c + rmid) / r, (c - rmid) / r).astype(np.float32)
    own_is_p = lower  # in the lower branch the own-block sample is 'p'
    return off_m, idx_m, w_m, off_p, idx_p, w_p, own_is_p


def _corner_grid(r: int) -> np.ndarray:
    """((r+1)^3, 3) corner coordinates, x-major."""
    ar = np.arange(r + 1)
    return np.stack(np.meshgrid(ar, ar, ar, indexing="ij"), axis=-1).reshape(-1, 3)


def corner_field(indexer: jnp.ndarray, slot_to_batch: jnp.ndarray,
                 valid_blocks: jnp.ndarray, cube_sdf: jnp.ndarray,
                 cube_std: jnp.ndarray, n_xyz: Tuple[int, int, int],
                 r: int, interpolate: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blend block lattices into block-corner values.

    Returns (corner_sdf, corner_std, corner_valid), each (B, r+1, r+1, r+1)
    for B = len(valid_blocks).  ``cube_sdf``/``cube_std`` may hold MORE rows
    than B (``slot_to_batch`` indexes into them): the chunked extract driver
    emits triangles for a block subset while interpolating corners against
    every evaluated neighbor.  Internally everything is (B, (r+1)^3) with
    the big block axis kept clean of trailing tiny dims.
    """
    nx, ny, nz = n_xyz
    B = valid_blocks.shape[0]
    side = 2 * r
    nc = (r + 1) ** 3
    block_ok = valid_blocks >= 0
    vb = jnp.maximum(valid_blocks, 0)
    bpos = jnp.stack([vb // (ny * nz), (vb // nz) % ny, vb % nz], axis=-1)  # (B, 3)
    cube_sdf_f = cube_sdf.reshape(-1, side ** 3)
    cube_std_f = cube_std.reshape(-1, side ** 3)
    cgrid = _corner_grid(r)                                                # (nc, 3)

    if not interpolate:
        # own-lattice corner samples only (non-interp variant)
        rstart = r // 2
        lat = ((cgrid[:, 0] + rstart) * side * side
               + (cgrid[:, 1] + rstart) * side + (cgrid[:, 2] + rstart))   # (nc,)
        own_batch = slot_to_batch[jnp.clip(indexer[vb], -1, slot_to_batch.shape[0] - 2)]
        valid = block_ok & (own_batch >= 0)
        bsafe = jnp.maximum(own_batch, 0)
        sdf = cube_sdf_f[bsafe][:, lat]
        std = cube_std_f[bsafe][:, lat]
        v = jnp.broadcast_to(valid[:, None], (B, nc))
        shape4 = (B, r + 1, r + 1, r + 1)
        return (jnp.where(v, sdf, jnp.nan).reshape(shape4),
                jnp.where(v, std, jnp.nan).reshape(shape4),
                v.reshape(shape4))

    off_m, idx_m, w_m, off_p, idx_p, w_p, own_is_p = _corner_tables(r)
    off_t = (off_m, off_p)
    idx_t = (idx_m, idx_p)
    w_t = (w_m, w_p)
    n_dim = (nx, ny, nz)

    num = jnp.zeros((B, nc), jnp.float32)
    den = jnp.zeros((B, nc), jnp.float32)
    wsum = jnp.zeros((B, nc), jnp.float32)
    own_invalid = jnp.zeros((B, nc), bool)

    for cx in range(2):       # 0 = m, 1 = p choice per dim
        for cy in range(2):
            for cz in range(2):
                choice = (cx, cy, cz)
                # static per-corner tables for this choice (numpy, (nc,))
                off_c = [off_t[ch][cgrid[:, a]] for a, ch in enumerate(choice)]
                idx_c = [idx_t[ch][cgrid[:, a]] for a, ch in enumerate(choice)]
                w_c = (w_t[cx][cgrid[:, 0]] * w_t[cy][cgrid[:, 1]]
                       * w_t[cz][cgrid[:, 2]])                       # (nc,)
                lat = (idx_c[0] * side * side + idx_c[1] * side
                       + idx_c[2]).astype(np.int32)                  # (nc,)

                coords = [bpos[:, a][:, None] + jnp.asarray(off_c[a])[None, :]
                          for a in range(3)]                         # 3 x (B, nc)
                oob = jnp.zeros((B, nc), bool)
                for a in range(3):
                    oob = oob | (coords[a] < 0) | (coords[a] >= n_dim[a])
                    coords[a] = jnp.clip(coords[a], 0, n_dim[a] - 1)
                cell = coords[0] * (ny * nz) + coords[1] * nz + coords[2]
                slot = indexer[cell]
                batch = slot_to_batch[jnp.clip(slot, -1, slot_to_batch.shape[0] - 2)]
                valid = (~oob) & (slot >= 0) & (batch >= 0) & block_ok[:, None]
                bsafe = jnp.maximum(batch, 0)
                s = cube_sdf_f[bsafe, jnp.asarray(lat)[None, :]]
                t = cube_std_f[bsafe, jnp.asarray(lat)[None, :]]
                w = jnp.asarray(w_c)[None, :]
                wt = jnp.where(valid, w * t, 0.0)
                num = num + jnp.where(valid, s * wt, 0.0)
                den = den + wt
                wsum = wsum + jnp.where(valid, w, 0.0)
                # the own-block combo: choice matches own_is_p per dim
                is_own = np.logical_and.reduce(
                    [own_is_p[cgrid[:, a]] == bool(ch)
                     for a, ch in enumerate(choice)])                # (nc,)
                own_invalid = own_invalid | (jnp.asarray(is_own)[None, :] & ~valid)

    corner_valid = (~own_invalid) & (den > 0)
    corner_sdf = jnp.where(corner_valid, num / jnp.maximum(den, 1e-30), jnp.nan)
    corner_std = jnp.where(corner_valid, den / jnp.maximum(wsum, 1e-30), jnp.nan)
    shape4 = (B, r + 1, r + 1, r + 1)
    return (corner_sdf.reshape(shape4), corner_std.reshape(shape4),
            corner_valid.reshape(shape4))


@partial(jax.jit, static_argnames=("n_xyz", "r", "max_triangles", "interpolate"))
def marching_cubes_sparse(indexer: jnp.ndarray, slot_to_batch: jnp.ndarray,
                          valid_blocks: jnp.ndarray, cube_sdf: jnp.ndarray,
                          cube_std: jnp.ndarray, n_xyz: Tuple[int, int, int],
                          r: int, max_triangles: int, max_std: float = 2000.0,
                          interpolate: bool = True) -> McResult:
    """Emit triangles for all active blocks.

    ``cube_sdf`` must already carry the reference's sign flip (map.py:687
    negates the decoder output before meshing).  ``max_std`` is traced (can
    change without recompile).
    """
    nx, ny, nz = n_xyz
    B = valid_blocks.shape[0]
    rp = r + 1
    n = r ** 3                                       # subcells per block
    c_sdf, c_std, c_ok = corner_field(indexer, slot_to_batch, valid_blocks,
                                      cube_sdf, cube_std, n_xyz, r, interpolate)
    cs = c_sdf.reshape(B, rp ** 3)
    ct = c_std.reshape(B, rp ** 3)
    cv = c_ok.reshape(B, rp ** 3)

    # static flat index of each subcell corner into the (r+1)^3 corner field
    sub = np.stack(np.meshgrid(*([np.arange(r)] * 3), indexing="ij"),
                   axis=-1).reshape(-1, 3)                            # (n, 3)
    corner_idx = np.stack([
        ((sub[:, 0] + dx) * rp * rp + (sub[:, 1] + dy) * rp + (sub[:, 2] + dz))
        for dx, dy, dz in CORNER_OFFSETS])                            # (8, n)

    v_sdf = [cs[:, corner_idx[i]] for i in range(8)]                  # 8 x (B, n)
    v_std = [ct[:, corner_idx[i]] for i in range(8)]
    v_ok = [cv[:, corner_idx[i]] for i in range(8)]

    cube_ok = v_ok[0]
    for i in range(1, 8):
        cube_ok = cube_ok & v_ok[i]
    cube_type = sum(jnp.where(v_sdf[i] < 0, 1 << i, 0) for i in range(8))
    cube_type = jnp.where(cube_ok, cube_type, 0)                      # (B, n)

    # subcell corner positions in grid units: block_pos + (sub + corner)/r
    vb = jnp.maximum(valid_blocks, 0)
    bpos = [(vb // (ny * nz)).astype(jnp.float32),
            ((vb // nz) % ny).astype(jnp.float32),
            (vb % nz).astype(jnp.float32)]                            # 3 x (B,)

    # edge vertices: per edge e, per coord c -> (B, n) position + (B, n) std
    edge_pos = []     # [e][c] -> (B, n)
    edge_std = []     # [e]    -> (B, n)
    for e in range(12):
        a, b = (int(x) for x in EDGE_CORNERS[e])
        va, vb_ = v_sdf[a], v_sdf[b]
        # sdf_interp semantics (mc_interp_kernel.cu:187-200)
        w2 = -va / jnp.where(jnp.abs(vb_ - va) < 1e-30, 1e-30, vb_ - va)
        w2 = jnp.where(jnp.abs(va - vb_) < 1e-5, 0.0, w2)
        w2 = jnp.where(jnp.abs(vb_) < 1e-5, 1.0, w2)
        w2 = jnp.where(jnp.abs(va) < 1e-5, 0.0, w2)
        pos_c = []
        for c in range(3):
            pa = (sub[:, c] + CORNER_OFFSETS[a][c]).astype(np.float32) / r
            pb = (sub[:, c] + CORNER_OFFSETS[b][c]).astype(np.float32) / r
            p = (jnp.asarray(pa)[None, :] * (1.0 - w2)
                 + jnp.asarray(pb)[None, :] * w2 + bpos[c][:, None])
            pos_c.append(p)
        edge_pos.append(pos_c)
        edge_std.append(v_std[a] * (1.0 - w2) + v_std[b] * w2)

    # stack edges on the LAST axis so gathers stay (.., big) shaped
    epos = [jnp.stack([edge_pos[e][c] for e in range(12)], axis=-1)   # (B, n, 12)
            for c in range(3)]
    estd = jnp.stack(edge_std, axis=-1)                               # (B, n, 12)

    tri_edges = jnp.asarray(TRI_TABLE)[cube_type]                     # (B, n, 16)
    block_of_sub = jnp.broadcast_to(valid_blocks[:, None], (B, n))

    # candidate triangles: 5 per subcell, rows (9, B*n) per slab
    rows, srows, masks = [], [], []
    for t in range(5):
        e = tri_edges[..., 3 * t:3 * t + 3]                           # (B, n, 3)
        exists = (e[..., 0] >= 0) & cube_ok
        esafe = jnp.maximum(e, 0)
        vstd_t, vrow_t = [], []
        for k in range(3):
            ek = esafe[..., k:k + 1]                                  # (B, n, 1)
            vs = jnp.take_along_axis(estd, ek, axis=-1)[..., 0]       # (B, n)
            vstd_t.append(vs)
            for c in range(3):
                vp = jnp.take_along_axis(epos[c], ek, axis=-1)[..., 0]
                vrow_t.append(vp)                                     # row k*3+c
        exists = exists & (vstd_t[0] <= max_std) & (vstd_t[1] <= max_std) \
            & (vstd_t[2] <= max_std)
        rows.append(jnp.stack([v.reshape(-1) for v in vrow_t]))       # (9, B*n)
        srows.append(jnp.stack([v.reshape(-1) for v in vstd_t]))      # (3, B*n)
        masks.append(exists.reshape(-1))

    all_tris = jnp.concatenate(rows, axis=1)                          # (9, 5*B*n)
    all_stds = jnp.concatenate(srows, axis=1)                         # (3, 5*B*n)
    all_mask = jnp.concatenate(masks)                                 # (5*B*n,)
    all_block = jnp.concatenate([block_of_sub.reshape(-1)] * 5)

    order = jnp.cumsum(all_mask.astype(jnp.int32)) - 1
    out_idx = jnp.where(all_mask & (order < max_triangles), order, max_triangles)
    triangles = jnp.zeros((9, max_triangles + 1), jnp.float32) \
        .at[:, out_idx].set(all_tris)[:, :-1]
    tri_std = jnp.zeros((3, max_triangles + 1), jnp.float32) \
        .at[:, out_idx].set(all_stds)[:, :-1]
    tri_block = jnp.full((max_triangles + 1,), -1, jnp.int32) \
        .at[out_idx].set(all_block)[:-1]
    count = all_mask.sum().astype(jnp.int32)
    return McResult(triangles, tri_std, tri_block, count)
