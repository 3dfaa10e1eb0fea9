"""Latent voxel map ("PLIVox" grid) as fixed-capacity functional state.

Capability parity with the reference ``DenseIndexedMap``
(pytorch/system/map.py:158-723): dense linear indexer over a bounded scene,
per-voxel latent codes fused from encoder observations with running-mean
("Bayesian") weighting, SDF queries through the shared decoder, latent
optimization against pseudo-SDF samples, and save/load.

TPU-first redesign decisions (cf. SURVEY.md section 7):

* **Fixed-capacity arrays + masked scatter** replace buffer doubling
  (map.py:263-285).  Allocation order is a prefix sum over the cell grid
  instead of a host-driven ``torch.unique`` + index assignment.
* **Dense per-cell scratch grids** replace ``torch.unique`` count pruning and
  the ``map_status`` bit tricks: with a bounded indexer the cell count is small
  (a few hundred thousand), so scatter-add over cells is cheaper than any
  sort, and everything stays inside one jitted step.
* The 8-offset gather loop (map.py:421-435) becomes one vectorized ``(N, 8)``
  computation; encoder inference and the per-voxel segment mean run as a
  single batched matmul + ``segment_sum``.
* The async optimizer process (map.py:29-113) is replaced by a jitted Adam
  loop over the gathered samples (XLA async dispatch already overlaps it with
  host work; see :func:`optimize_latents`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderSpec, decode
from ..models.encoder import encode_points

_INT32_MAX = np.iinfo(np.int32).max


class MapConfig(NamedTuple):
    """Static map geometry/thresholds (hashable -> usable as a jit static)."""
    bound_min: Tuple[float, float, float]
    n_xyz: Tuple[int, int, int]
    voxel_size: float
    latent_dim: int = 29
    capacity: int = 1 << 15
    prune_min_vox_obs: int = 16
    ignore_count_th: float = 16.0
    encoder_count_th: float = 600.0

    @property
    def n_cells(self) -> int:
        return int(np.prod(self.n_xyz))

    @property
    def bound_max(self) -> Tuple[float, float, float]:
        return tuple(b + n * self.voxel_size for b, n in zip(self.bound_min, self.n_xyz))

    @classmethod
    def from_args(cls, args, latent_dim: int = 29, capacity: int = 1 << 15) -> "MapConfig":
        """Build from a reference-style mapping config namespace
        (bound_min/bound_max/voxel_size/prune_min_vox_obs/...)."""
        bound_min = tuple(float(b) for b in args.bound_min)
        n_xyz = tuple(int(np.ceil((bmax - bmin) / args.voxel_size))
                      for bmin, bmax in zip(bound_min, args.bound_max))
        return cls(
            bound_min=bound_min, n_xyz=n_xyz, voxel_size=float(args.voxel_size),
            latent_dim=latent_dim, capacity=capacity,
            prune_min_vox_obs=int(getattr(args, "prune_min_vox_obs", 16)),
            ignore_count_th=float(getattr(args, "ignore_count_th", 16.0)),
            encoder_count_th=float(getattr(args, "encoder_count_th", 600.0)),
        )


class MapState(NamedTuple):
    """Device-resident map state (a pytree of fixed-shape arrays)."""
    indexer: jnp.ndarray     # (n_cells,) int32: cell -> latent slot, -1 free
    latents: jnp.ndarray     # (capacity, L) f32
    positions: jnp.ndarray   # (capacity,) int32: slot -> cell id, -1 free
    obs_count: jnp.ndarray   # (capacity,) f32
    optimized: jnp.ndarray   # (capacity,) bool
    mesh_dirty: jnp.ndarray  # (capacity,) bool: touched since last meshing
    n_occupied: jnp.ndarray  # () int32
    overflow: jnp.ndarray    # () int32: allocations dropped due to capacity
    opt_overflow: jnp.ndarray  # () int32: touched slots beyond the latent
    #                              optimizer's working-table budget (those
    #                              slots kept fused values for that round)


def create_map_state(cfg: MapConfig) -> MapState:
    return MapState(
        indexer=jnp.full((cfg.n_cells,), -1, jnp.int32),
        latents=jnp.zeros((cfg.capacity, cfg.latent_dim), jnp.float32),
        positions=jnp.full((cfg.capacity,), -1, jnp.int32),
        obs_count=jnp.zeros((cfg.capacity,), jnp.float32),
        optimized=jnp.zeros((cfg.capacity,), bool),
        mesh_dirty=jnp.zeros((cfg.capacity,), bool),
        n_occupied=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        opt_overflow=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Grid helpers
# ---------------------------------------------------------------------------


def linearize(cfg: MapConfig, xyz_id: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) integer cell coords -> (...,) linear id (reference map.py:287)."""
    nx, ny, nz = cfg.n_xyz
    return xyz_id[..., 2] + nz * xyz_id[..., 1] + (nz * ny) * xyz_id[..., 0]


def unlinearize(cfg: MapConfig, idx: jnp.ndarray) -> jnp.ndarray:
    nx, ny, nz = cfg.n_xyz
    return jnp.stack([idx // (ny * nz), (idx // nz) % ny, idx % nz], axis=-1)


def normalize_points(cfg: MapConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    bound_min = jnp.asarray(cfg.bound_min, xyz.dtype)
    return (xyz - bound_min) / cfg.voxel_size


def cell_of(cfg: MapConfig, xyz_normalized: jnp.ndarray) -> jnp.ndarray:
    """Voxel id of a normalized point (ceil - 1, matching map.py:368)."""
    return jnp.ceil(xyz_normalized).astype(jnp.int32) - 1


def in_bounds(cfg: MapConfig, cell: jnp.ndarray) -> jnp.ndarray:
    n = jnp.asarray(cfg.n_xyz, jnp.int32)
    return jnp.all((cell >= 0) & (cell < n), axis=-1)


def dilate6(cfg: MapConfig, flag: jnp.ndarray) -> jnp.ndarray:
    """6-neighborhood dilation of a (n_cells,) bool grid with edge clamping --
    the TPU form of ``_expand_flatten_id`` (reference map.py:545-557)."""
    f = flag.reshape(cfg.n_xyz)
    out = f
    for axis in range(3):
        padded = jnp.pad(f, [(1, 1) if a == axis else (0, 0) for a in range(3)])
        lo = [slice(0, -2) if a == axis else slice(None) for a in range(3)]
        hi = [slice(2, None) if a == axis else slice(None) for a in range(3)]
        out = out | padded[tuple(lo)] | padded[tuple(hi)]
    return out.reshape(-1)


_INTEGRATION_OFFSETS = np.array([
    [-0.5, -0.5, -0.5], [-0.5, -0.5, 0.5], [-0.5, 0.5, -0.5], [-0.5, 0.5, 0.5],
    [0.5, -0.5, -0.5], [0.5, -0.5, 0.5], [0.5, 0.5, -0.5], [0.5, 0.5, 0.5],
], dtype=np.float32)  # reference map.py:186-189


# ---------------------------------------------------------------------------
# Integration (allocation + encoder fusion)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def integrate_keyframe(cfg: MapConfig, enc_params: Dict[str, Any], state: MapState,
                       surface_xyz: jnp.ndarray, surface_normal: jnp.ndarray,
                       valid: jnp.ndarray) -> MapState:
    """Fuse one keyframe's observations into the map.

    Semantics parity with reference ``integrate_keyframe`` steps 1-2
    (map.py:340-452): sparse-observation pruning, voxel allocation expanded by
    the 6-neighborhood, focus-pruned 8-offset gathering, per-point 'cnp'
    encoding and weighted-running-mean latent fusion.  ``surface_xyz`` (N, 3)
    world coords, ``surface_normal`` (N, 3), ``valid`` (N,) padding mask; N is
    static (pad the frame's point cloud to a fixed budget).
    """
    n = surface_xyz.shape[0]
    pn = normalize_points(cfg, surface_xyz)          # (N, 3) in voxel units
    cell = cell_of(cfg, pn)                          # (N, 3)
    valid = valid & in_bounds(cfg, cell)
    lin = jnp.clip(linearize(cfg, cell), 0, cfg.n_cells - 1)

    # 1. prune sparsely-observed voxels (reference map.py:371-378)
    cell_counts = jnp.zeros(cfg.n_cells, jnp.int32).at[lin].add(valid.astype(jnp.int32))
    keep = valid & (cell_counts[lin] > cfg.prune_min_vox_obs)

    # 2. allocate new voxels, expanded by the 6-neighborhood so marching cubes
    #    sees dummy neighbors (reference map.py:380-387)
    surviving_cell = jnp.zeros(cfg.n_cells, bool).at[lin].max(keep)
    new_cell = surviving_cell & (state.indexer < 0)
    alloc_flag = dilate6(cfg, new_cell) & (state.indexer < 0)
    order = jnp.cumsum(alloc_flag.astype(jnp.int32))
    slot = state.n_occupied + order - 1              # slot per allocated cell
    alloc_ok = alloc_flag & (slot < cfg.capacity)
    indexer = jnp.where(alloc_ok, slot, state.indexer)
    cell_ids = jnp.arange(cfg.n_cells, dtype=jnp.int32)
    scatter_slot = jnp.where(alloc_ok, slot, cfg.capacity)  # OOB -> dropped
    positions = state.positions.at[scatter_slot].set(cell_ids, mode="drop")
    n_alloc = order[-1]
    n_occupied = jnp.minimum(state.n_occupied + n_alloc, cfg.capacity)
    overflow = state.overflow + jnp.maximum(state.n_occupied + n_alloc - cfg.capacity, 0)

    # 3. encoder-eligible voxels: allocated and not yet converged
    #    (reference map.py:409-411)
    slot_of_cell = jnp.clip(indexer, 0, cfg.capacity - 1)
    allocated = indexer >= 0
    enc_cell = allocated & (state.obs_count[slot_of_cell] < cfg.encoder_count_th)

    # focus prune: a point participates iff its own voxel is in the
    # 6-dilation of the encoder-voxel set (reference map.py:389-397)
    focus = keep & dilate6(cfg, enc_cell)[lin]

    # 4. vectorized 8-offset gather (reference map.py:421-435)
    offsets = jnp.asarray(_INTEGRATION_OFFSETS)              # (8, 3)
    ng = jnp.ceil(pn[:, None, :] + offsets[None]) - 1        # (N, 8, 3) float
    ng = jnp.clip(ng, 0, jnp.asarray(cfg.n_xyz, pn.dtype) - 1)
    rel = pn[:, None, :] - ng - 0.5                          # (N, 8, 3)
    ng_lin = linearize(cfg, ng.astype(jnp.int32))            # (N, 8)
    tgt_slot = indexer[ng_lin]                               # (N, 8)
    contrib = focus[:, None] & enc_cell[ng_lin]              # (N, 8)
    tgt_slot_safe = jnp.where(contrib, tgt_slot, cfg.capacity)

    xyzn = jnp.concatenate([rel, jnp.broadcast_to(surface_normal[:, None, :], rel.shape)],
                           axis=-1).reshape(n * 8, 6)
    codes = encode_points(enc_params, xyzn)                  # (N*8, L)
    w = contrib.reshape(-1).astype(jnp.float32)
    seg = tgt_slot_safe.reshape(-1)
    sums = jax.ops.segment_sum(codes * w[:, None], seg, num_segments=cfg.capacity + 1)[:-1]
    cnts = jax.ops.segment_sum(w, seg, num_segments=cfg.capacity + 1)[:-1]

    # 5. weighted-running-mean fusion (reference map.py:448-452)
    new_count = state.obs_count + cnts
    denom = jnp.maximum(new_count, 1e-12)
    fused = (sums + state.latents * state.obs_count[:, None]) / denom[:, None]
    touched = cnts > 0
    latents = jnp.where(touched[:, None], fused, state.latents)
    mesh_dirty = state.mesh_dirty | touched

    return MapState(indexer=indexer, latents=latents, positions=positions,
                    obs_count=new_count, optimized=state.optimized,
                    mesh_dirty=mesh_dirty, n_occupied=n_occupied,
                    overflow=overflow, opt_overflow=state.opt_overflow)


# ---------------------------------------------------------------------------
# SDF query
# ---------------------------------------------------------------------------


def latent_count_table(state) -> jnp.ndarray:
    """(capacity, L+1) latents with ``obs_count`` appended as the last
    column.  TPU gathers cost ~flat per ROW regardless of width, so a
    query against this fused table needs ONE row gather where the plain
    state needs two (latents + obs_count).  Iterating callers (the GN
    tracker) build it once per frame outside their loops and pass it as
    ``aug_table`` to :func:`query_sdf`."""
    return jnp.concatenate(
        [state.latents, state.obs_count[:, None].astype(state.latents.dtype)],
        axis=1)


def gather_latent_rel(cfg: MapConfig, state: MapState, xyz: jnp.ndarray,
                      aug_table: jnp.ndarray = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The pre-decode half of :func:`query_sdf`: voxel lookup + latent
    gather + voxel-local coordinates.  Returns (latent (N, L) stop-gradiented,
    rel (N, 3), valid (N,)); ``d rel / d xyz = 1 / voxel_size`` (the chain
    factor fused-gradient callers apply, core/tracker._sdf_term)."""
    pn = normalize_points(cfg, xyz)
    cell = cell_of(cfg, jax.lax.stop_gradient(pn))
    inside = in_bounds(cfg, cell)
    lin = jnp.clip(linearize(cfg, cell), 0, cfg.n_cells - 1)
    slot = state.indexer[lin]
    allocated = inside & (slot >= 0)
    slot_safe = jnp.clip(slot, 0, cfg.capacity - 1)
    if aug_table is not None:
        row = aug_table[slot_safe]
        valid = allocated & (row[:, -1] > cfg.ignore_count_th)
        latent = jnp.where(valid[:, None], row[:, :-1], 0.0)
    else:
        valid = allocated & (state.obs_count[slot_safe] > cfg.ignore_count_th)
        latent = jnp.where(valid[:, None], state.latents[slot_safe], 0.0)
    latent = jax.lax.stop_gradient(latent)
    rel = pn - cell.astype(pn.dtype) - 0.5  # relative_network_offset (map.py:197)
    return latent, rel, valid


def gather_latent_rel_cached(cfg: MapConfig, state: MapState, xyz: jnp.ndarray,
                             aug_table: jnp.ndarray, cache):
    """:func:`gather_latent_rel` with an iteration-carried cache: when every
    query falls in the same cell as last time (``cache`` = (cell (N, 3) i32,
    latent (N, L), valid (N,))), a scalar ``lax.cond`` skips the
    indexer+row gathers entirely and reuses the cached rows -- EXACT
    equivalence, since any cell change triggers a full re-gather (there is
    no stale reuse).  This is the GN tracker's iteration structure made
    explicit: late GN steps move points sub-voxel, and the per-iteration
    row gather is gn_track's largest instruction (~0.3 ms/frame,
    BENCH_ROOFLINE).  Seed the cache with an impossible cell (e.g.
    ``-2**30``) to force the first gather.  Returns
    (latent, rel, valid, new_cache)."""
    pn = normalize_points(cfg, xyz)
    cell = cell_of(cfg, jax.lax.stop_gradient(pn))
    c_cell, c_lat, c_val = cache
    changed = jnp.any(cell != c_cell)

    def fresh(_):
        inside = in_bounds(cfg, cell)
        lin = jnp.clip(linearize(cfg, cell), 0, cfg.n_cells - 1)
        slot = state.indexer[lin]
        allocated = inside & (slot >= 0)
        slot_safe = jnp.clip(slot, 0, cfg.capacity - 1)
        row = aug_table[slot_safe]
        valid = allocated & (row[:, -1] > cfg.ignore_count_th)
        latent = jnp.where(valid[:, None], row[:, :-1], 0.0)
        return latent, valid

    latent, valid = jax.lax.cond(changed, fresh,
                                 lambda _: (c_lat, c_val), None)
    latent = jax.lax.stop_gradient(latent)
    rel = pn - cell.astype(pn.dtype) - 0.5
    return latent, rel, valid, (cell, latent, valid)


def query_sdf(cfg: MapConfig, dec_params: Dict[str, Any], spec: DecoderSpec,
              state: MapState, xyz: jnp.ndarray,
              compute_dtype=jnp.float32,
              aug_table: jnp.ndarray = None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SDF/std lookup with validity mask -- reference ``get_sdf``
    (map.py:559-579) without the dynamic gather: invalid entries decode a zero
    latent and are masked downstream.  Returns (sdf (N,), std (N,), valid (N,)).

    ``aug_table``: optional precomputed :func:`latent_count_table` --
    collapses the latents + obs_count gathers into one row gather."""
    latent, rel, valid = gather_latent_rel(cfg, state, xyz, aug_table)
    sdf, std = decode(dec_params, spec, latent, rel, compute_dtype=compute_dtype)
    return sdf, std, valid


# ---------------------------------------------------------------------------
# Latent optimization (reference map.py step 3 + OptimizeProcess.do_optimize)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def build_optimize_samples(cfg: MapConfig, state: MapState,
                           surface_xyz: jnp.ndarray, surface_normal: jnp.ndarray,
                           valid: jnp.ndarray, noise_key: jax.Array
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build noisy pseudo-SDF samples for converged voxels (reference
    map.py:459-493): slide surface points along their normals by N(0, 0.05)
    and target that offset as the GT SDF.  Returns
    (slot_ids (N*8,), rel_xyz (N*8, 3), gt_sdf (N*8,), mask (N*8,))."""
    n = surface_xyz.shape[0]
    pn = normalize_points(cfg, surface_xyz)
    cell = cell_of(cfg, pn)
    valid = valid & in_bounds(cfg, cell)
    lin = jnp.clip(linearize(cfg, cell), 0, cfg.n_cells - 1)

    slot_of_cell = jnp.clip(state.indexer, 0, cfg.capacity - 1)
    allocated = state.indexer >= 0
    optim_cell = allocated & (state.obs_count[slot_of_cell] >= cfg.encoder_count_th) \
        & ~state.optimized[slot_of_cell]
    focus = valid & dilate6(cfg, optim_cell)[lin]

    offsets = jnp.asarray(_INTEGRATION_OFFSETS)
    ng = jnp.ceil(pn[:, None, :] + offsets[None]) - 1
    ng = jnp.clip(ng, 0, jnp.asarray(cfg.n_xyz, pn.dtype) - 1)
    rel = pn[:, None, :] - ng - 0.5
    ng_lin = linearize(cfg, ng.astype(jnp.int32))
    tgt_slot = state.indexer[ng_lin]
    contrib = focus[:, None] & optim_cell[ng_lin]

    gt_sdf = jax.random.normal(noise_key, (n, 8)) * 0.05
    rel = rel + gt_sdf[..., None] * surface_normal[:, None, :]
    return (jnp.where(contrib, tgt_slot, cfg.capacity).reshape(-1),
            rel.reshape(-1, 3), gt_sdf.reshape(-1), contrib.reshape(-1))


@partial(jax.jit, static_argnames=("cfg", "spec", "n_iters", "lr",
                                   "code_reg_lambda", "max_slots"))
def optimize_latents(cfg: MapConfig, dec_params: Dict[str, Any], spec: DecoderSpec,
                     state: MapState, slot_ids: jnp.ndarray, rel_xyz: jnp.ndarray,
                     gt_sdf: jnp.ndarray, mask: jnp.ndarray,
                     n_iters: int = 20, lr: float = 1e-2,
                     code_reg_lambda: float = 0.0,
                     max_slots: int = 2048) -> MapState:
    """Adam-optimize latent codes of converged voxels against the clamped-NLL
    loss (reference OptimizeProcess.do_optimize, map.py:80-113).

    Like the reference, only the UNIQUE latents referenced by ``slot_ids``
    are optimized (map.py:96-104): the touched slots are compacted into a
    static (max_slots, L) working table (sort-based unique), Adam runs over
    that table in a jitted ``fori_loop``, and the result scatters back --
    O(max_slots) optimizer state per call instead of O(capacity).  Touched
    slots beyond ``max_slots`` keep their fused values for this round, and
    their count accumulates into ``state.opt_overflow`` so the truncation is
    observable (surfaced by ``SLAMSystem.run_sequence``)."""
    import optax

    from ..ops.segment import padded_unique_inverse

    n_samples = jnp.maximum(mask.sum(), 1).astype(jnp.float32)
    w = mask.astype(jnp.float32)

    # compact segment id per sample; invalid samples and budget overflow park
    # at row max_slots (a scratch row that is never scattered back)
    uq = padded_unique_inverse(slot_ids, valid=mask)
    comp = jnp.minimum(uq.inverse, max_slots)
    in_budget = w * (uq.inverse < max_slots)
    # slot id represented by each compact row (-1 for empty rows)
    row_slot = jax.ops.segment_max(
        jnp.where(mask, slot_ids, -1), comp, num_segments=max_slots + 1)[:-1]
    row_live = row_slot >= 0
    row_slot_safe = jnp.clip(row_slot, 0, cfg.capacity - 1)
    table0 = state.latents[row_slot_safe] * row_live[:, None]     # (K, L)

    def loss_fn(table):
        lat = table[comp]                           # scratch row decodes too;
        sdf, std = decode(dec_params, spec, lat, rel_xyz)   # masked below
        pd = jnp.clip(sdf, -0.2, 0.2)
        gt = jnp.clip(gt_sdf, -0.2, 0.2)
        ll = 0.5 * ((gt - pd) / std) ** 2 + jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi)
        loss = jnp.sum(ll * in_budget) / n_samples
        if code_reg_lambda > 0:
            norms = jnp.linalg.norm(table[:-1], axis=1)
            loss = loss + code_reg_lambda * jnp.sum(norms * row_live) / n_samples
        return loss

    opt = optax.adam(lr)
    table0 = jnp.concatenate([table0, jnp.zeros((1, table0.shape[1]),
                                                table0.dtype)])   # scratch row

    def body_fn(_, carry):
        table, opt_state = carry
        grads = jax.grad(loss_fn)(table)
        updates, opt_state = opt.update(grads, opt_state, table)
        return optax.apply_updates(table, updates), opt_state

    table, _ = jax.lax.fori_loop(0, n_iters, body_fn, (table0, opt.init(table0)))

    scatter_slot = jnp.where(row_live, row_slot_safe, cfg.capacity)
    latents = state.latents.at[scatter_slot].set(
        jnp.where(row_live[:, None], table[:-1], 0.0), mode="drop")
    touched = jnp.zeros(cfg.capacity, bool).at[scatter_slot].set(
        True, mode="drop")
    n_over = jnp.maximum(uq.count - max_slots, 0).astype(jnp.int32)
    return state._replace(latents=latents,
                          optimized=state.optimized | touched,
                          mesh_dirty=state.mesh_dirty | touched,
                          opt_overflow=state.opt_overflow + n_over)


@jax.jit
def merge_optimize_result(state: MapState, old_latents: jnp.ndarray,
                          new_latents: jnp.ndarray, old_counts: jnp.ndarray,
                          touched: jnp.ndarray) -> MapState:
    """Merge an optimizer result computed from a snapshot into the current
    state with **delta de-integration** re-weighting (reference
    _update_optimize_result_set, map.py:321-335):

        merged = (cur * n_cur + (new - old) * n_old) / n_cur

    i.e. the optimizer's correction, weighted by the observation count it was
    computed against, is re-applied on top of whatever fusion happened since
    the snapshot.  This is what lets the optimizer run interleaved with
    fusion (the reference's aux-GPU process; here XLA async dispatch)."""
    n_cur = jnp.maximum(state.obs_count, 1e-12)
    merged = (state.latents * n_cur[:, None]
              + (new_latents - old_latents) * old_counts[:, None]) / n_cur[:, None]
    apply = touched & (state.obs_count > 0)
    latents = jnp.where(apply[:, None], merged, state.latents)
    return state._replace(latents=latents,
                          optimized=state.optimized | apply,
                          mesh_dirty=state.mesh_dirty | apply)


# ---------------------------------------------------------------------------
# Save / load (reference map.py:239-249)
# ---------------------------------------------------------------------------


def save_map(path: str, cfg: MapConfig, state: MapState):
    arrays = {f"state.{name}": np.asarray(getattr(state, name)) for name in state._fields}
    meta = dict(bound_min=np.asarray(cfg.bound_min), n_xyz=np.asarray(cfg.n_xyz),
                voxel_size=np.asarray(cfg.voxel_size), latent_dim=np.asarray(cfg.latent_dim),
                capacity=np.asarray(cfg.capacity), prune_min_vox_obs=np.asarray(cfg.prune_min_vox_obs),
                ignore_count_th=np.asarray(cfg.ignore_count_th),
                encoder_count_th=np.asarray(cfg.encoder_count_th))
    np.savez_compressed(path, **arrays, **{f"cfg.{k}": v for k, v in meta.items()})


def load_map(path: str) -> Tuple[MapConfig, MapState]:
    data = np.load(path)
    cfg = MapConfig(
        bound_min=tuple(float(x) for x in data["cfg.bound_min"]),
        n_xyz=tuple(int(x) for x in data["cfg.n_xyz"]),
        voxel_size=float(data["cfg.voxel_size"]),
        latent_dim=int(data["cfg.latent_dim"]),
        capacity=int(data["cfg.capacity"]),
        prune_min_vox_obs=int(data["cfg.prune_min_vox_obs"]),
        ignore_count_th=float(data["cfg.ignore_count_th"]),
        encoder_count_th=float(data["cfg.encoder_count_th"]),
    )
    # counters added in later versions default to 0 for older saves
    state = MapState(**{name: (jnp.asarray(data[f"state.{name}"])
                               if f"state.{name}" in data
                               else jnp.zeros((), jnp.int32))
                        for name in MapState._fields})
    return cfg, state
