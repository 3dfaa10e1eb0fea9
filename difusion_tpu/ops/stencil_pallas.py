"""Pallas TPU kernel for the fused preprocessing window stencil.

The tracker's outlier-count + PCA-normal pass reduces a (2w+1)^2 pixel
window into 11 per-pixel statistics (:func:`difusion_tpu.core.tracker`'s
``_window_stats``).  The jnp formulation materializes (K, H, W) patch stacks
in HBM (~10 arrays of 169 x 76800 floats); this kernel keeps the four padded
component maps resident in VMEM (~1.3 MB) and accumulates all statistics in
registers across the unrolled window -- zero HBM intermediates.

STATUS: kept as a measured negative result.  The kernel is correct
(interpret-mode parity test in tests/test_tracker.py) and compiles on TPU,
but horizontal window offsets slice the LANE dimension at non-128-aligned
starts, which Mosaic lowers to per-lane shift sequences ~1000x slower than
XLA's fused patch-stack formulation (3.9 s vs ~2 ms for a 5x5 window at
240x320).  The tracker therefore defaults to the jnp path; this file
documents why hand-written kernels lose to XLA for this op class on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def window_stat_sums(px: jnp.ndarray, py: jnp.ndarray, pz: jnp.ndarray,
                     vf: jnp.ndarray, window: int, outlier_r2: float,
                     normal_r2: float, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, ...]:
    """All window reductions in one pass.

    Inputs are the UNPADDED (H, W) point-component maps and the validity map
    as f32 (1.0 valid).  Returns 11 (H, W) f32 arrays:
    (outlier_cnt, cnt, s1x, s1y, s1z, sxx, sxy, sxz, syy, syz, szz) where the
    s* are raw weighted sums (the caller applies the one-pass covariance
    identity)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = px.shape
    pad = window
    pads = ((pad, pad), (pad, pad))
    ppx = jnp.pad(px, pads)
    ppy = jnp.pad(py, pads)
    ppz = jnp.pad(pz, pads)
    pvf = jnp.pad(vf, pads)

    def kernel(px_ref, py_ref, pz_ref, vf_ref, *out_refs):
        # accumulate THROUGH the output refs: register accumulators across a
        # 169-tap unrolled loop blow Mosaic's scoped-vmem stack (each live
        # array is another (H, W) buffer)
        for ref in out_refs:
            ref[:] = jnp.zeros((h, w), jnp.float32)
        cx = px_ref[pad:pad + h, pad:pad + w]
        cy = py_ref[pad:pad + h, pad:pad + w]
        cz = pz_ref[pad:pad + h, pad:pad + w]
        for dv in range(2 * pad + 1):
            for du in range(2 * pad + 1):
                nx = px_ref[dv:dv + h, du:du + w]
                ny = py_ref[dv:dv + h, du:du + w]
                nz = pz_ref[dv:dv + h, du:du + w]
                ok = vf_ref[dv:dv + h, du:du + w]
                ddx = nx - cx
                ddy = ny - cy
                ddz = nz - cz
                d2 = ddx * ddx + ddy * ddy + ddz * ddz
                out_refs[0][:] += jnp.where(d2 <= outlier_r2, ok, 0.0)
                wgt = jnp.where(d2 <= normal_r2, ok, 0.0)
                out_refs[1][:] += wgt
                out_refs[2][:] += wgt * nx
                out_refs[3][:] += wgt * ny
                out_refs[4][:] += wgt * nz
                out_refs[5][:] += wgt * nx * nx
                out_refs[6][:] += wgt * nx * ny
                out_refs[7][:] += wgt * nx * nz
                out_refs[8][:] += wgt * ny * ny
                out_refs[9][:] += wgt * ny * nz
                out_refs[10][:] += wgt * nz * nz

    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32) for _ in range(11)]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        interpret=interpret,
    )(ppx, ppy, ppz, pvf)
