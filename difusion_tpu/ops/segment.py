"""Static-shape segment / group-by primitives.

TPU-native replacements for the reference's atomic CUDA segment ops
(``groupby_sum`` / ``pack_batch``, pytorch/system/ext/indexing/indexing.cu) and
for the dynamic ``torch.unique`` idioms used throughout the reference map.
Everything here is shape-static and jittable: "unique" is expressed as
sort + boundary flags + prefix sums, and reductions go through
``jax.ops.segment_sum`` which XLA lowers to efficient sorted scatters.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PaddedUnique(NamedTuple):
    """Result of :func:`padded_unique_inverse`.

    ``inverse``: (N,) segment id in [0, N) for every input element; elements
    sharing a value share a segment id; segment ids are dense and ordered by
    sorted value.  ``count``: scalar number of distinct values.  Invalid inputs
    (see ``valid`` arg) are all mapped to one trailing segment.
    """
    inverse: jnp.ndarray
    count: jnp.ndarray


def padded_unique_inverse(ids: jnp.ndarray, valid: jnp.ndarray = None) -> PaddedUnique:
    """Dense segment ids for equal values, fully static shapes.

    Replaces ``torch.unique(..., return_inverse=True)`` (used e.g. at
    reference map.py:374,437).  If ``valid`` is given, invalid elements are
    sorted last and share one segment that is NOT counted in ``count``.
    """
    n = ids.shape[0]
    if valid is not None:
        big = jnp.iinfo(ids.dtype).max
        ids = jnp.where(valid, ids, big)
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    first = jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)])
    seg_sorted = jnp.cumsum(first) - 1  # (N,) dense segment id in sorted order
    inverse = jnp.zeros(n, jnp.int32).at[order].set(seg_sorted)
    count = seg_sorted[-1] + 1
    if valid is not None:
        n_invalid_seg = jnp.any(~valid).astype(jnp.int32)
        count = count - n_invalid_seg
    return PaddedUnique(inverse=inverse, count=count)


def segment_sum(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                weights: jnp.ndarray = None) -> jnp.ndarray:
    """Weighted segment sum; ``values`` (N, L) or (N,), ids (N,)."""
    if weights is not None:
        w = weights.astype(values.dtype)
        values = values * (w[:, None] if values.ndim == 2 else w)
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_mean(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 weights: jnp.ndarray = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment mean + counts -- parity with the reference ``groupby_reduce``
    (pytorch/network/utility.py:186-208).  Returns (means, counts); empty
    segments get mean 0."""
    sums = segment_sum(values, segment_ids, num_segments, weights)
    ones = jnp.ones(values.shape[0], values.dtype) if weights is None else weights.astype(values.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(counts, 1e-12)
    means = sums / (denom[:, None] if values.ndim == 2 else denom)
    return means, counts


def pack_batch(group_ids: jnp.ndarray, n_batch: int, n_point: int,
               valid: jnp.ndarray = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter up to ``n_point`` sample indices per group into (B, n_point)
    slots (reference pack_batch, system/ext/indexing/indexing.cu:17-35).

    The CUDA kernel fills slots first-come via an atomic counter; here the
    deterministic equivalent assigns within-group ranks by a stable sort and
    scatters samples with rank < n_point.  Returns (packed (B, n_point) int32
    with -1 padding, counts (B,) int32 clamped to n_point).
    """
    n = group_ids.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    g = jnp.where(valid & (group_ids >= 0) & (group_ids < n_batch),
                  group_ids, n_batch)
    order = jnp.argsort(g, stable=True)
    g_s = g[order]
    # within-group rank along the sorted order
    idx = jnp.arange(n)
    start_of_group = jnp.full(n_batch + 1, n, jnp.int32).at[g_s].min(
        idx.astype(jnp.int32), mode="drop")
    rank = idx.astype(jnp.int32) - start_of_group[jnp.clip(g_s, 0, n_batch)]
    ok = (g_s < n_batch) & (rank < n_point)
    flat = jnp.where(ok, g_s * n_point + rank, n_batch * n_point)
    packed = jnp.full((n_batch * n_point + 1,), -1, jnp.int32) \
        .at[flat].set(order.astype(jnp.int32))[:-1].reshape(n_batch, n_point)
    counts = jnp.zeros(n_batch + 1, jnp.int32).at[g_s].add(1, mode="drop")[:-1]
    return packed, jnp.minimum(counts, n_point)


def groupby_max(values: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """Segment max (reference groupby_max, indexing.cu:48-57 -- unused at
    runtime there, provided for API completeness)."""
    return jax.ops.segment_max(values, segment_ids, num_segments=num_segments)


def pack_samples(sample_indexer: jnp.ndarray, count: int, key,
                 max_batches: int, sample_values: jnp.ndarray = None):
    """Random per-group subsample of fixed size (reference ``pack_samples``,
    pytorch/network/utility.py:152-183): shuffle, pack up to 2*count indices
    per group, then draw ``count`` of them with replacement.

    Static-shape version: ``max_batches`` bounds the number of groups (the
    reference sizes it from ``torch.unique``).  Returns
    (packed (B, count, L) or packed_inds (B, count), group_valid (B,)).
    """
    n = sample_indexer.shape[0]
    shuffle = jax.random.permutation(key, n)
    shuffled_ids = sample_indexer[shuffle]
    uq = padded_unique_inverse(shuffled_ids)
    packed_inds, pcount = pack_batch(uq.inverse, max_batches, 2 * count)
    pcount = jnp.clip(pcount, 0, 2 * count - 1)
    pick = jnp.floor(jax.random.uniform(jax.random.fold_in(key, 1),
                                        (max_batches, count))
                     * jnp.maximum(pcount, 1)[:, None]).astype(jnp.int32)
    inds = jnp.take_along_axis(packed_inds, pick, axis=1)          # (B, count)
    inds = shuffle[jnp.maximum(inds, 0)]
    group_valid = (jnp.arange(max_batches) < uq.count) & (pcount > 0)
    if sample_values is not None:
        packed = sample_values[inds.reshape(-1)].reshape(max_batches, count, -1)
        return packed, group_valid
    return inds, group_valid
