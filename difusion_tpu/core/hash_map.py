"""Hash-indexed latent voxel map for unbounded scenes.

The dense indexer (:mod:`difusion_tpu.core.map`) needs scene bounds known up
front (reference map.py:178 allocates Nx*Ny*Nz int64s).  For real-world
sequences with dynamic growth (BASELINE config 4 / ScanNet) this module keys
voxels by an **open-addressing hash table over integer cell coordinates**:
fixed table size, linear probing, everything jittable.

Parallel insertion without atomics (the GPU idiom is a CAS loop): a few
rounds of *scatter-min claiming* -- every pending key writes its rank to its
probe position with ``.at[].min``, winners take the entry, losers (and
duplicate cells, which match the freshly written key) resolve in the same or
the next round.  ``n_probes`` rounds of one scatter + a few gathers each,
fully vectorized over the batch.

State layout mirrors :class:`difusion_tpu.core.map.MapState` slot arrays, so
fusion/query semantics are shared by construction (same running-mean fusion,
same thresholds); only cell->slot resolution differs.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderSpec, decode
from ..models.encoder import encode_points

_EMPTY = np.int32(-2 ** 31)      # key sentinel (cell coords never reach it)
_HASH_PRIMES = np.array([73856093, 19349663, 83492791], dtype=np.uint32)


class HashMapConfig(NamedTuple):
    voxel_size: float
    latent_dim: int = 29
    capacity: int = 1 << 16          # latent slots
    table_size: int = 1 << 18        # hash entries (power of two, > capacity)
    n_probes: int = 8
    prune_min_vox_obs: int = 16
    ignore_count_th: float = 16.0
    encoder_count_th: float = 600.0

    @classmethod
    def from_args(cls, args, latent_dim: int = 29, capacity: int = 1 << 16,
                  table_size: int = 1 << 18) -> "HashMapConfig":
        return cls(voxel_size=float(args.voxel_size), latent_dim=latent_dim,
                   capacity=capacity, table_size=table_size,
                   prune_min_vox_obs=int(getattr(args, "prune_min_vox_obs", 16)),
                   ignore_count_th=float(getattr(args, "ignore_count_th", 16.0)),
                   encoder_count_th=float(getattr(args, "encoder_count_th", 600.0)))


class HashMapState(NamedTuple):
    keys: jnp.ndarray        # (T, 3) int32 cell coords, _EMPTY when free
    table_slot: jnp.ndarray  # (T,) int32 latent slot, -1 when unassigned
    latents: jnp.ndarray     # (capacity, L)
    slot_cell: jnp.ndarray   # (capacity, 3) int32 reverse map (slot -> cell)
    obs_count: jnp.ndarray   # (capacity,)
    optimized: jnp.ndarray   # (capacity,) bool
    mesh_dirty: jnp.ndarray  # (capacity,) bool
    n_occupied: jnp.ndarray  # () int32
    overflow: jnp.ndarray    # () int32: inserts dropped (probe or capacity)
    opt_overflow: jnp.ndarray  # () int32: latent-optimizer table truncation


def create_hash_map_state(cfg: HashMapConfig) -> HashMapState:
    return HashMapState(
        keys=jnp.full((cfg.table_size, 3), _EMPTY, jnp.int32),
        table_slot=jnp.full((cfg.table_size,), -1, jnp.int32),
        latents=jnp.zeros((cfg.capacity, cfg.latent_dim), jnp.float32),
        slot_cell=jnp.full((cfg.capacity, 3), _EMPTY, jnp.int32),
        obs_count=jnp.zeros((cfg.capacity,), jnp.float32),
        optimized=jnp.zeros((cfg.capacity,), bool),
        mesh_dirty=jnp.zeros((cfg.capacity,), bool),
        n_occupied=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        opt_overflow=jnp.zeros((), jnp.int32),
    )


def cell_of(cfg: HashMapConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """World position -> integer cell (same ceil-1 convention as the dense
    map, reference map.py:368, with implicit origin 0)."""
    return (jnp.ceil(xyz / cfg.voxel_size) - 1).astype(jnp.int32)


def _hash(cfg: HashMapConfig, cell: jnp.ndarray) -> jnp.ndarray:
    c = cell.astype(jnp.uint32)
    h = (c[..., 0] * _HASH_PRIMES[0]) ^ (c[..., 1] * _HASH_PRIMES[1]) \
        ^ (c[..., 2] * _HASH_PRIMES[2])
    return (h & (cfg.table_size - 1)).astype(jnp.int32)


def lookup(cfg: HashMapConfig, keys: jnp.ndarray, cells: jnp.ndarray
           ) -> jnp.ndarray:
    """(..., 3) cells -> (...,) table position or -1.  ``n_probes`` linear
    probes; an empty entry ends the search (insertion never leaves gaps)."""
    flat = cells.reshape(-1, 3)
    h = _hash(cfg, flat)
    pos = jnp.full(flat.shape[0], -1, jnp.int32)
    done = jnp.zeros(flat.shape[0], bool)
    for r in range(cfg.n_probes):
        p = (h + r) & (cfg.table_size - 1)
        k = keys[p]
        match = jnp.all(k == flat, axis=-1)
        empty = k[:, 0] == _EMPTY
        pos = jnp.where(~done & match, p, pos)
        done = done | match | empty
    return pos.reshape(cells.shape[:-1])


def insert(cfg: HashMapConfig, state: HashMapState, cells: jnp.ndarray,
           want: jnp.ndarray) -> Tuple[HashMapState, jnp.ndarray]:
    """Insert (or find) a batch of cells.  cells (M, 3), want (M,) bool.
    Returns (state', table_pos (M,) int32; -1 where dropped).

    Claiming protocol per probe round: pending keys scatter their rank into
    the round's probe position (min wins); the winner writes its key; every
    pending key then re-checks the position -- a key match (its own win, a
    duplicate's win, or a pre-existing entry) resolves it.
    """
    m = cells.shape[0]
    T = cfg.table_size
    h = _hash(cfg, cells)
    rank = jnp.arange(m, dtype=jnp.int32)
    keys = state.keys
    table_pos = jnp.full(m, -1, jnp.int32)
    pending = want

    for r in range(cfg.n_probes):
        p = (h + r) & (T - 1)
        entry = keys[p]                                     # (M, 3)
        empty = entry[:, 0] == _EMPTY
        # claim empty entries: lowest rank wins
        claim = jnp.where(pending & empty, rank, m)
        winner = jnp.full(T, m, jnp.int32).at[p].min(claim)
        won = pending & empty & (winner[p] == rank)
        keys = keys.at[jnp.where(won, p, T)].set(cells, mode="drop")
        # resolve: fresh read covers own wins, duplicate-cell wins, and
        # entries that existed before this call
        match = jnp.all(keys[p] == cells, axis=-1)
        table_pos = jnp.where(pending & match, p, table_pos)
        pending = pending & ~match

    # assign latent slots to freshly claimed table entries
    is_new = (keys[:, 0] != _EMPTY) & (state.table_slot < 0)
    order = jnp.cumsum(is_new.astype(jnp.int32))
    slot = state.n_occupied + order - 1
    ok = is_new & (slot < cfg.capacity)
    table_slot = jnp.where(ok, slot, state.table_slot)
    slot_safe = jnp.where(ok, slot, cfg.capacity)
    slot_cell = state.slot_cell.at[slot_safe].set(keys, mode="drop")
    n_new = order[-1]
    n_occupied = jnp.minimum(state.n_occupied + n_new, cfg.capacity)
    overflow = state.overflow + jnp.sum(pending & want) \
        + jnp.maximum(state.n_occupied + n_new - cfg.capacity, 0)

    return state._replace(keys=keys, table_slot=table_slot, slot_cell=slot_cell,
                          n_occupied=n_occupied, overflow=overflow), table_pos


def slot_of(cfg: HashMapConfig, state: HashMapState, cells: jnp.ndarray
            ) -> jnp.ndarray:
    """cells (..., 3) -> latent slot or -1."""
    pos = lookup(cfg, state.keys, cells)
    safe = jnp.maximum(pos, 0)
    return jnp.where(pos >= 0, state.table_slot[safe], -1)


_INTEGRATION_OFFSETS = np.array([
    [-0.5, -0.5, -0.5], [-0.5, -0.5, 0.5], [-0.5, 0.5, -0.5], [-0.5, 0.5, 0.5],
    [0.5, -0.5, -0.5], [0.5, -0.5, 0.5], [0.5, 0.5, -0.5], [0.5, 0.5, 0.5],
], dtype=np.float32)

_NEIGHBORS7 = np.array([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.int32)


@partial(jax.jit, static_argnames=("cfg",))
def integrate_keyframe(cfg: HashMapConfig, enc_params: Dict[str, Any],
                       state: HashMapState, surface_xyz: jnp.ndarray,
                       surface_normal: jnp.ndarray, valid: jnp.ndarray
                       ) -> HashMapState:
    """Hash-map analog of the dense ``integrate_keyframe`` (same reference
    semantics, map.py:340-452): per-cell observation pruning, allocation
    expanded by the 6-neighborhood, focus-pruned 8-offset gather, encoder
    fusion with running-mean weighting."""
    n = surface_xyz.shape[0]
    pn = surface_xyz / cfg.voxel_size
    cell = cell_of(cfg, surface_xyz)                         # (N, 3)

    # 1. per-cell observation counts via scatter on the (tentative) table
    # position of each point's own cell: count prune before allocation
    h = _hash(cfg, cell)
    # exact counting needs segments per *cell*; use sort-based segments on
    # (hash, cell) like the box filter
    order = jnp.lexsort((cell[:, 2], cell[:, 1], cell[:, 0], h))
    h_s = h[order]
    c_s = cell[order]
    v_s = valid[order]
    same = (h_s == jnp.roll(h_s, 1)) & jnp.all(c_s == jnp.roll(c_s, 1, axis=0), axis=1)
    seg_id = jnp.cumsum(~same.at[0].set(False)) - 1
    seg_cnt = jax.ops.segment_sum(v_s.astype(jnp.int32), seg_id, num_segments=n)
    cnt_sorted = seg_cnt[seg_id]
    count_of_point = jnp.zeros(n, jnp.int32).at[order].set(cnt_sorted)
    keep = valid & (count_of_point > cfg.prune_min_vox_obs)

    # 2. allocate surviving cells + their 6-neighborhood
    nb_cells = (cell[:, None, :] + jnp.asarray(_NEIGHBORS7)[None]).reshape(-1, 3)
    nb_want = jnp.broadcast_to(keep[:, None], (n, 7)).reshape(-1)
    state, nb_pos = insert(cfg, state, nb_cells, nb_want)
    nb_pos = nb_pos.reshape(n, 7)

    # 3. encoder-eligible neighbor cells; focus = own cell within the
    # 6-dilation of the eligible set (reference map.py:389-397)
    nb_slot = jnp.where(nb_pos >= 0,
                        state.table_slot[jnp.maximum(nb_pos, 0)], -1)
    nb_elig = (nb_slot >= 0) & (state.obs_count[jnp.clip(nb_slot, 0, cfg.capacity - 1)]
                                < cfg.encoder_count_th)
    focus = keep & jnp.any(nb_elig, axis=1)

    # 4. vectorized 8-offset gather + per-point encoding
    offsets = jnp.asarray(_INTEGRATION_OFFSETS)
    ng = jnp.ceil(pn[:, None, :] + offsets[None]) - 1        # (N, 8, 3) float
    rel = pn[:, None, :] - ng - 0.5
    ng_slot = slot_of(cfg, state, ng.astype(jnp.int32))      # (N, 8)
    ng_elig = (ng_slot >= 0) & (state.obs_count[jnp.clip(ng_slot, 0, cfg.capacity - 1)]
                                < cfg.encoder_count_th)
    contrib = focus[:, None] & ng_elig
    seg = jnp.where(contrib, ng_slot, cfg.capacity)

    xyzn = jnp.concatenate([rel, jnp.broadcast_to(surface_normal[:, None, :], rel.shape)],
                           axis=-1).reshape(n * 8, 6)
    codes = encode_points(enc_params, xyzn)
    w = contrib.reshape(-1).astype(jnp.float32)
    sums = jax.ops.segment_sum(codes * w[:, None], seg.reshape(-1),
                               num_segments=cfg.capacity + 1)[:-1]
    cnts = jax.ops.segment_sum(w, seg.reshape(-1), num_segments=cfg.capacity + 1)[:-1]

    new_count = state.obs_count + cnts
    fused = (sums + state.latents * state.obs_count[:, None]) \
        / jnp.maximum(new_count, 1e-12)[:, None]
    touched = cnts > 0
    latents = jnp.where(touched[:, None], fused, state.latents)
    return state._replace(latents=latents, obs_count=new_count,
                          mesh_dirty=state.mesh_dirty | touched)


@partial(jax.jit, static_argnames=("cfg", "spec", "compute_dtype"))
def query_sdf(cfg: HashMapConfig, dec_params: Dict[str, Any], spec: DecoderSpec,
              state: HashMapState, xyz: jnp.ndarray, compute_dtype=jnp.float32,
              aug_table: jnp.ndarray = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hash-map SDF query (reference get_sdf, map.py:559-579).

    ``aug_table``: optional precomputed
    :func:`difusion_tpu.core.map.latent_count_table` -- one row gather
    instead of latents + obs_count (see the dense ``query_sdf``)."""
    latent, rel, valid = gather_latent_rel(cfg, state, xyz, aug_table)
    sdf, std = decode(dec_params, spec, latent, rel, compute_dtype=compute_dtype)
    return sdf, std, valid


def gather_latent_rel(cfg: HashMapConfig, state: HashMapState,
                      xyz: jnp.ndarray, aug_table: jnp.ndarray = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-decode half of the hash ``query_sdf`` (probe + latent gather +
    voxel-local coords); same contract as the dense
    :func:`difusion_tpu.core.map.gather_latent_rel`."""
    pn = xyz / cfg.voxel_size
    cell = cell_of(cfg, jax.lax.stop_gradient(pn) * cfg.voxel_size)
    slot = slot_of(cfg, state, cell)
    slot_safe = jnp.clip(slot, 0, cfg.capacity - 1)
    if aug_table is not None:
        row = aug_table[slot_safe]
        valid = (slot >= 0) & (row[:, -1] > cfg.ignore_count_th)
        latent = jax.lax.stop_gradient(
            jnp.where(valid[:, None], row[:, :-1], 0.0))
    else:
        valid = (slot >= 0) & (state.obs_count[slot_safe] > cfg.ignore_count_th)
        latent = jax.lax.stop_gradient(
            jnp.where(valid[:, None], state.latents[slot_safe], 0.0))
    rel = pn - cell.astype(pn.dtype) - 0.5
    return latent, rel, valid


@partial(jax.jit, static_argnames=("cfg",))
def build_optimize_samples(cfg: HashMapConfig, state: HashMapState,
                           surface_xyz: jnp.ndarray, surface_normal: jnp.ndarray,
                           valid: jnp.ndarray, noise_key: jax.Array):
    """Hash-map analog of the dense ``build_optimize_samples`` (reference
    map.py:459-493): noisy pseudo-SDF samples over converged, not-yet
    optimized voxels.  Returns (slot_ids, rel_xyz, gt_sdf, mask), each row
    one of the point's 8 offset targets."""
    n = surface_xyz.shape[0]
    pn = surface_xyz / cfg.voxel_size
    offsets = jnp.asarray(_INTEGRATION_OFFSETS)
    ng = jnp.ceil(pn[:, None, :] + offsets[None]) - 1
    rel = pn[:, None, :] - ng - 0.5
    slot = slot_of(cfg, state, ng.astype(jnp.int32))         # (N, 8)
    slot_safe = jnp.clip(slot, 0, cfg.capacity - 1)
    optim = (slot >= 0) & (state.obs_count[slot_safe] >= cfg.encoder_count_th) \
        & ~state.optimized[slot_safe]
    contrib = valid[:, None] & optim

    gt_sdf = jax.random.normal(noise_key, (n, 8)) * 0.05
    rel = rel + gt_sdf[..., None] * surface_normal[:, None, :]
    return (jnp.where(contrib, slot, cfg.capacity).reshape(-1),
            rel.reshape(-1, 3), gt_sdf.reshape(-1), contrib.reshape(-1))


# the latent Adam loop and de-integration merge are slot-space only: reuse
# the dense map's implementations on hash state (same field names)
from .map import merge_optimize_result  # noqa: E402,F401


def optimize_latents(cfg: HashMapConfig, dec_params, spec: DecoderSpec,
                     state: HashMapState, slot_ids, rel_xyz, gt_sdf, mask,
                     n_iters: int = 20, lr: float = 1e-2,
                     code_reg_lambda: float = 0.0) -> HashMapState:
    from . import map as _M
    dense_like = _M.MapConfig(bound_min=(0.0, 0.0, 0.0), n_xyz=(1, 1, 1),
                              voxel_size=cfg.voxel_size,
                              latent_dim=cfg.latent_dim, capacity=cfg.capacity)
    out = _M.optimize_latents(dense_like, dec_params, spec, state, slot_ids,
                              rel_xyz, gt_sdf, mask, n_iters=n_iters, lr=lr,
                              code_reg_lambda=code_reg_lambda)
    return out


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------


def save_map(path: str, cfg: HashMapConfig, state: HashMapState):
    arrays = {f"state.{k}": np.asarray(getattr(state, k)) for k in state._fields}
    meta = {f"cfg.{k}": np.asarray(getattr(cfg, k)) for k in cfg._fields}
    np.savez_compressed(path, **arrays, **meta)


def load_map(path: str) -> Tuple[HashMapConfig, HashMapState]:
    data = np.load(path)
    cfg = HashMapConfig(**{k: (float(data[f"cfg.{k}"]) if k in
                               ("voxel_size", "ignore_count_th", "encoder_count_th")
                               else int(data[f"cfg.{k}"]))
                           for k in HashMapConfig._fields})
    # counters added in later versions default to 0 for older saves
    state = HashMapState(**{k: (jnp.asarray(data[f"state.{k}"])
                                if f"state.{k}" in data
                                else jnp.zeros((), jnp.int32))
                            for k in HashMapState._fields})
    return cfg, state
