"""Point-cloud ops: fixed-radius neighbor queries, outlier removal, PCA
normal estimation, and voxel box filtering.

Capability parity with the reference pcproc extension
(pytorch/system/ext/pcproc/pcproc.cu + cuda_kdtree.cu) and the tracker's
``point_box_filter`` (pytorch/system/tracker.py:13-23), redesigned for TPU:

* The GPU kd-tree (cuda_kdtree.cu, 1349 LoC of FLANN) is **replaced by a
  sorted spatial grid**: the tracker and sampler only ever need fixed-radius
  neighbors, and a uniform grid with cell size = radius answers those with
  27 contiguous gathers -- sort + searchsorted instead of tree build +
  traversal, all static-shape and jittable.
* ``torch.unique``-based voxel downsampling becomes a sort + prefix-sum
  segment mean: segment ids come out prefix-packed, so compaction to a fixed
  output budget is a slice, not a host sync.

Neighbor search is exact up to two documented caps: at most ``cell_cap``
candidates are scanned per grid cell and at most 27 cells per query; points
beyond the cap are ignored (the reference's FLANN kNN is similarly
approximate under its ``checks`` budget).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .imgproc import sym3eig_smallest

_HASH_PRIMES = np.array([73856093, 19349663, 83492791], dtype=np.uint32)


class NeighborGrid(NamedTuple):
    """Sorted spatial grid over a fixed-size point set."""
    points: jnp.ndarray        # (N, 3) f32
    valid: jnp.ndarray         # (N,) bool
    cell: jnp.ndarray          # (N, 3) int32 cell coords of each point
    order: jnp.ndarray         # (N,) int32 point index sorted by cell hash
    sorted_hash: jnp.ndarray   # (N,) uint32 hash per sorted point
    cell_size: float


def _hash_cells(cell: jnp.ndarray) -> jnp.ndarray:
    c = cell.astype(jnp.uint32)
    h = (c[..., 0] * _HASH_PRIMES[0]) ^ (c[..., 1] * _HASH_PRIMES[1]) \
        ^ (c[..., 2] * _HASH_PRIMES[2])
    return h


def build_grid(points: jnp.ndarray, valid: jnp.ndarray, cell_size: float) -> NeighborGrid:
    cell = jnp.floor(points / cell_size).astype(jnp.int32)
    h = _hash_cells(cell)
    # invalid points sort to the end (max hash) and are skipped by the
    # per-candidate validity check
    h = jnp.where(valid, h, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(h).astype(jnp.int32)
    return NeighborGrid(points=points, valid=valid, cell=cell, order=order,
                        sorted_hash=h[order], cell_size=float(cell_size))


_NEIGHBOR_CELLS = np.array([(dx, dy, dz) for dx in (-1, 0, 1)
                            for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                           dtype=np.int32)  # (27, 3)


def radius_neighbors(grid: NeighborGrid, queries: jnp.ndarray,
                     q_valid: jnp.ndarray, radius: float,
                     cell_cap: int = 16, exclude_self_index: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All grid points within ``radius`` of each query, capped at
    27*cell_cap candidates.  Returns (idx (Q, 27*cell_cap) int32 into the grid
    point array, ok (Q, 27*cell_cap) bool).

    ``exclude_self_index`` drops the candidate whose index equals the query's
    position (for self-queries; reference estimate_normal skips nn_i == 0,
    pcproc.cu:115)."""
    q_cell = jnp.floor(queries / grid.cell_size).astype(jnp.int32)   # (Q, 3)
    nb_cell = q_cell[:, None, :] + jnp.asarray(_NEIGHBOR_CELLS)[None]  # (Q, 27, 3)
    nb_hash = _hash_cells(nb_cell)                                    # (Q, 27)
    start = jnp.searchsorted(grid.sorted_hash, nb_hash.reshape(-1)).reshape(nb_hash.shape)

    n = grid.points.shape[0]
    k = jnp.arange(cell_cap, dtype=jnp.int32)
    slot = jnp.clip(start[..., None] + k, 0, n - 1)                   # (Q, 27, C)
    cand = grid.order[slot]                                           # (Q, 27, C)
    cand_hash_ok = grid.sorted_hash[slot] == nb_hash[..., None]
    # exact cell check: hash collisions inside the scanned run are rejected
    cand_cell_ok = jnp.all(grid.cell[cand] == nb_cell[..., None, :], axis=-1)
    ok = cand_hash_ok & cand_cell_ok & grid.valid[cand] & q_valid[:, None, None]

    d2 = jnp.sum((grid.points[cand] - queries[:, None, None, :]) ** 2, axis=-1)
    ok = ok & (d2 <= radius * radius)
    if exclude_self_index:
        q_idx = jnp.arange(queries.shape[0], dtype=jnp.int32)
        ok = ok & (cand != q_idx[:, None, None])
    qc = queries.shape[0]
    return cand.reshape(qc, -1), ok.reshape(qc, -1)


def remove_radius_outlier(points: jnp.ndarray, valid: jnp.ndarray,
                          nb_points: int = 16, radius: float = 0.05,
                          cell_cap: int = 16) -> jnp.ndarray:
    """Keep points with >= nb_points neighbors (self included) within radius
    (reference remove_radius_outlier, pcproc.cu:160-187: the (nb_points-1)-th
    kNN distance must be < radius)."""
    grid = build_grid(points, valid, radius)
    _, ok = radius_neighbors(grid, points, valid, radius, cell_cap)
    count = ok.sum(axis=-1)
    return valid & (count >= nb_points)


def estimate_normals(points: jnp.ndarray, valid: jnp.ndarray,
                     max_nn: int = 16, radius: float = 0.1,
                     cam_xyz=(0.0, 0.0, 0.0), cell_cap: int = 16
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PCA normals from radius neighbors with camera-facing flip (reference
    estimate_normals, pcproc.cu:107-158,189-210).  Neighbors beyond ``max_nn``
    tighten the estimate rather than being truncated (the kNN cap in the
    reference exists only to bound the FLANN buffer).  Requires >= 5 neighbors
    (self excluded) like the reference; returns (normal (N, 3), ok (N,))."""
    grid = build_grid(points, valid, radius)
    idx, ok = radius_neighbors(grid, points, valid, radius, cell_cap,
                               exclude_self_index=True)
    w = ok.astype(points.dtype)                                  # (N, K)
    cnt = w.sum(axis=-1)
    nb = points[idx]                                             # (N, K, 3)
    mean = jnp.sum(nb * w[..., None], axis=1) / jnp.maximum(cnt, 1.0)[:, None]
    d = (nb - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nka,nkb->nab", d, nb - mean[:, None, :])
    normal, _ = sym3eig_smallest(cov)
    to_cam = points - jnp.asarray(cam_xyz, points.dtype)[None]
    flip = jnp.sum(normal * to_cam, axis=-1) > 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    return normal, valid & (cnt >= 5.0)


# ---------------------------------------------------------------------------
# Voxel box filter (tracker.py:13-23) + compaction
# ---------------------------------------------------------------------------


def point_box_filter(points: jnp.ndarray, normals: jnp.ndarray,
                     valid: jnp.ndarray, voxel_size: float,
                     out_budget: int,
                     aabb: Optional[tuple] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxel-mean downsample: average points/normals per occupied voxel
    (reference point_box_filter).  Sort-based exact unique; segment ids are
    prefix-packed so the first ``out_budget`` segments are the output.

    ``aabb``: optional static ((x0, y0, z0), (x1, y1, z1)) bound on the valid
    points (e.g. the camera frustum at the depth cut).  When the implied cell
    grid fits int32, cells pack into ONE exact linear key and the filter
    costs a single sort; without it, four lexsort passes de-alias the cell
    hash (a TPU sort is ~150 full-array compare-exchange sweeps, so the
    keying dominates the cost).  Out-of-bound valid points are dropped.
    Returns (points (M, 3), normals (M, 3), ok (M,))."""
    n = points.shape[0]
    ref = jnp.floor(points / voxel_size).astype(jnp.int32)

    packed = None
    if aabb is not None:
        import math
        lo = [int(math.floor(c / voxel_size)) - 1 for c in aabb[0]]
        hi = [int(math.floor(c / voxel_size)) + 1 for c in aabb[1]]
        dims = [h - l + 1 for l, h in zip(lo, hi)]
        if dims[0] * dims[1] * dims[2] < 2 ** 31:
            packed = (lo, dims)

    if packed is not None:
        lo, dims = packed
        ix = ref - jnp.asarray(lo, jnp.int32)
        inb = valid & jnp.all((ix >= 0) & (ix < jnp.asarray(dims, jnp.int32)),
                              axis=1)
        key = (ix[:, 0] * dims[1] + ix[:, 1]) * dims[2] + ix[:, 2]
        # bijective Knuth-multiplicative scramble: cells stay collision-free
        # but sort in PSEUDO-RANDOM order, so when occupied cells exceed
        # ``out_budget`` the kept subset is a spatially unbiased sample (a
        # raw linear key would keep an x-sorted slab -- measured +60% ATE on
        # the 120-frame noise study)
        key = key.astype(jnp.uint32) * jnp.uint32(2654435761)
        sentinel = jnp.uint32(0xFFFFFFFF)
        key = jnp.where(inb, key, sentinel)                 # invalid sorts last
        # one sort yields BOTH the sorted keys and the permutation; validity
        # falls out of the sentinel compare -- no post-sort key/pred gathers
        key_s, order = jax.lax.sort(
            (key, jax.lax.iota(jnp.int32, n)), num_keys=1)
        same = key_s == jnp.roll(key_s, 1)
        v_s = (key_s != sentinel).astype(points.dtype)
    else:
        # order-preserving key: pack 3x ~20-bit offsets (bounded scenes) into
        # i64 is unavailable (no x64) -- use a collision-checked sort on the
        # hash plus the coords as tiebreaker via lexsort over two keys
        h = _hash_cells(ref)
        h = jnp.where(valid, h, jnp.uint32(0xFFFFFFFF))
        order = jnp.lexsort((ref[:, 2], ref[:, 1], ref[:, 0], h))
        h_s = h[order]
        ref_s = ref[order]
        same = (h_s == jnp.roll(h_s, 1)) & jnp.all(
            ref_s == jnp.roll(ref_s, 1, axis=0), axis=1)
        v_s = valid[order].astype(points.dtype)
    seg_start = ~same
    seg_start = seg_start.at[0].set(True)
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1             # (N,)

    # Segment reduction WITHOUT a scatter: after the sort, every voxel's rows
    # are contiguous, so per-segment sums are differences of one prefix sum
    # sampled at the segment boundaries -- cumsum + binary search instead of
    # the random-addressing scatter-add a segment_sum lowers to (profiled at
    # ~1 ms/frame for the (76800, 7) payload; this path is ~0.1 ms).
    #
    # f32 prefix values quantize at eps * |csum|, so the payload is REBASED
    # before summing to keep |csum| tiny: points relative to their own cell
    # corner live in [0, voxel_size); normals (and the centered point
    # residual) subtract the frame's mean so the prefix random-walks around
    # zero instead of growing linearly.  The per-segment add-back is exact
    # (corner + count * mean).
    vsz = jnp.asarray(voxel_size, points.dtype)
    p_rel = points - ref.astype(points.dtype) * vsz - 0.5 * vsz      # (N, 3)
    # invalid rows may carry NaN (e.g. degenerate PCA normals); a prefix sum
    # would propagate them to EVERY later segment (the old scatter contained
    # them in their own sentinel segment), so zero them with where -- a
    # multiply by 0 keeps NaN
    keep2 = valid[:, None]
    p_rel = jnp.where(keep2, p_rel, 0.0)
    nrm_safe = jnp.where(keep2, normals, 0.0)
    w = valid.astype(points.dtype)
    n_valid = jnp.maximum(w.sum(), 1.0)
    n_base = jnp.sum(nrm_safe, axis=0) / n_valid                     # (3,)
    payload = jnp.concatenate(
        [p_rel, nrm_safe - jnp.where(keep2, n_base[None], 0.0),
         jnp.ones((n, 1), points.dtype)],
        axis=1)                                                      # (N, 7)
    # materialize before indexing: without the barrier XLA splits the packed
    # gather back into per-source-column gathers (profiled), re-paying the
    # per-row addressing cost three times
    payload = jax.lax.optimization_barrier(payload)
    pay_s = payload[order] * v_s[:, None]

    csum = jnp.cumsum(pay_s, axis=0)                                 # (N, 7)
    csum = jnp.concatenate([jnp.zeros((1, 7), csum.dtype), csum])
    # First row of segment k, k = 0..B: segment-start positions sort to the
    # front in segment order (seg_id is monotone), and the fill value ``n``
    # doubles as the end boundary of the last segment.  One (N,) sort
    # (~0.08 ms) -- NOT jnp.searchsorted, whose vmapped binary search lowers
    # to 17 dependent (B,)-row gather steps (profiled at ~0.9 ms/frame).
    pos = jnp.where(seg_start, jnp.arange(n, dtype=jnp.int32), n)
    if out_budget + 1 > n:       # shape contract: always out_budget outputs
        pos = jnp.concatenate([pos, jnp.full(out_budget + 1 - n, n,
                                             jnp.int32)])
    start = jax.lax.sort(pos)[:out_budget + 1]                       # (B+1,)
    sums = csum[start[1:]] - csum[start[:-1]]                        # (B, 7)
    cnts = sums[:, 6]
    inv = 1.0 / jnp.maximum(cnts, 1.0)
    ok = cnts > 0.5
    # cell corner of each output segment, via its first sorted row
    first_row = ref[order[jnp.minimum(start[:-1], n - 1)]]           # (B, 3)
    corner = first_row.astype(points.dtype) * vsz + 0.5 * vsz
    mean_p = jnp.where(ok[:, None], sums[:, 0:3] * inv[:, None] + corner, 0.0)
    mean_n = jnp.where(ok[:, None], sums[:, 3:6] * inv[:, None] + n_base[None],
                       0.0)
    return mean_p, mean_n, ok


def compact(valid: jnp.ndarray, budget: int, *arrays: jnp.ndarray):
    """Move valid rows to the front (stable) and slice to ``budget``.
    Returns (mask (budget,), *arrays[:budget]).  The jit-safe replacement for
    the reference's boolean-mask compaction idiom."""
    order = jnp.argsort(~valid)       # stable: valid (False) keys first
    mask = valid[order][:budget]
    out = tuple(a[order][:budget] for a in arrays)
    return (mask,) + out
