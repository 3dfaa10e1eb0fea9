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
