"""Order-robust (compensated) reductions for the GN normal equations.

Why this exists: the reference accumulates H, g on device but solves the 6x6
system in NumPy float64 on host every iteration
(/root/reference/pytorch/system/tracker.py:272, with .cpu() syncs at
:170,218).  The TPU rebuild is f32 end-to-end -- the right default -- but
plain f32 tree-reductions make the accumulated H, g depend on XLA's fusion
/ reduction order, and over a 240-frame loop-closure sequence that
reduction-order noise compounds into a measured ~30% ATE band across
numerically-neutral refactors (ACCURACY_r04 loop_noisy_variance).  TPUs have
no native f64, so instead of porting the host solve we make the accumulation
itself order-independent: a vectorized **pairwise TwoSum cascade** whose
result is accurate to ~1 ulp of the EXACT sum of the f32 products,
regardless of how XLA schedules it.

Method: at every halving level, adjacent partials combine through the exact
TwoSum error-free transformation (Knuth); the rounding error of each add is
captured exactly and carried in a parallel error accumulator.  After
log2(N) levels the error accumulator holds (to second order) exactly what
the main sum dropped.  Total error is O(eps^2 * N) vs O(eps * log N *
condition) for a plain tree sum -- i.e. the result no longer depends on
summation order at f32 resolution, which is the property the tracker needs.

The only remaining order-dependent piece is the rounding of the products
J_a*J_b*w themselves, which is per-element and schedule-independent.

Cost: the operand is materialized as an (N, C) product stack (C = 28 for
the SDF/RGB terms' packed [H | g | E]) and reduced in log2(N) vectorized
VPU rounds over shrinking arrays -- ~2x the data in elementwise flops,
negligible next to the decoder matmuls that produced J.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Knuth TwoSum: s = fl(a+b), e exact s.t. a + b = s + e.

    Branch-free, valid for any magnitude ordering.  XLA's algebraic
    simplifier does not reassociate float adds, so the error term survives
    compilation (regression-tested in test_tracker.py: the cascade must
    beat a plain sum on a cancellation-heavy case by orders of magnitude).
    """
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def pairwise_compensated_sum(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Compensated sum of ``x`` along ``axis``; result ~1 ulp of the exact
    sum of the inputs, independent of XLA reduction/fusion order.

    TPU shape discipline: the cascade folds CONTIGUOUS halves
    (``x[:n//2] + x[n//2:]``) -- recursive halving is just another summation
    order, and contiguous slices stay cheap where stride-2 slices lower to
    per-row gathers.  The input is zero-padded to a power of two once
    (TwoSum with 0 is exact), so every level is a clean halve."""
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    pow2 = 1 << max(n - 1, 1).bit_length()
    if pow2 != n:
        pad = [(0, pow2 - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    err = jnp.zeros_like(x)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        s, e = _two_sum(x[:h], x[h:])
        # error-accumulator adds are plain f32: their own rounding is
        # second-order (errors of errors)
        err = err[:h] + err[h:] + e
        x = s
    return (x + err)[0]


def gram_compensated(rows: jnp.ndarray, w: jnp.ndarray, scale) -> jnp.ndarray:
    """Weighted Gram matrix ``M[a,b] = scale * sum_n w[n] rows[n,a] rows[n,b]``
    with order-robust accumulation.  ``rows`` (N, R), ``w`` (N,).  Returns
    (R, R) symmetric.  This is the compensated replacement for the tracker's
    one-Gram-product trick (H | g | E from a single contraction): the
    products are formed explicitly in f32 (their rounding is per-element and
    schedule-independent) and reduced with the pairwise TwoSum cascade."""
    R = rows.shape[1]
    iu, ju = jnp.triu_indices(R)
    prod = (rows * w[:, None])[:, iu] * rows[:, ju]        # (N, P) upper tri
    tri = pairwise_compensated_sum(prod, axis=0) * scale   # (P,)
    M = jnp.zeros((R, R), rows.dtype)
    M = M.at[iu, ju].set(tri)
    lo = jnp.tril_indices(R, -1)
    return M.at[lo].set(M.T[lo])


def gram_blocked(rows: jnp.ndarray, w: jnp.ndarray, scale,
                 block: int = 512) -> jnp.ndarray:
    """Weighted Gram with BLOCKED order-robust accumulation: per-block
    partial Grams from one batched contraction (the MXU does the N-axis
    reduction in fixed hardware order), then the compensated pairwise
    cascade combines the ~N/block partials exactly.

    Rationale (measured, round 5): the full TwoSum cascade of
    :func:`gram_compensated` materializes the (N, P) product stack and
    round-trips it through log2(N) shrinking elementwise kernels --
    ~+2.0 ms/frame at tracker scale (gn_ab.py, interleaved A/B).  This
    variant reads ``rows`` once per term inside a single fused
    batched-matmul and only cascades over the (N/block, R, R) partials,
    so its cost is within noise of the plain einsum.

    Stability contract (weaker than gram_compensated, sufficient for the
    refactor band): the result is a fixed, explicitly-structured reduction
    tree -- XLA cannot reassociate across the block boundary (float adds
    are not reassociated) and the contraction's internal order is the
    hardware's fixed sequential-K order -- so numerically-neutral REFACTORS
    of surrounding code cannot move H, g.  Unlike the full cascade the
    result is not invariant under PERMUTATION of the input rows (block
    membership changes); the residual movement is bounded by within-block
    f32 rounding, measured ~100x smaller than the plain path's
    (test_tracker.py)."""
    N, R = rows.shape
    nb = -(-N // block)
    pad = nb * block - N
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        w = jnp.pad(w, (0, pad))
    rw = (rows * w[:, None]).reshape(nb, block, R)
    rr = rows.reshape(nb, block, R)
    partials = jnp.einsum("bkr,bks->brs", rw, rr)          # (nb, R, R)
    M = pairwise_compensated_sum(partials.reshape(nb, R * R), axis=0)
    return (M * scale).reshape(R, R)


def gram(rows: jnp.ndarray, w: jnp.ndarray, scale, mode: str) -> jnp.ndarray:
    """Dispatch on the tracker's ``solve_dtype`` gram mode."""
    if mode == "compensated":
        return gram_compensated(rows, w, scale)
    assert mode == "blocked", mode
    return gram_blocked(rows, w, scale)
