"""Lattice sample generation (parity with reference ``get_samples``,
pytorch/network/utility.py:129-149)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_samples(r: int, a: float = 0.0, b: float = None) -> jnp.ndarray:
    """(r^3, 3) lattice over [a, b]^3, x-major order, step (b-a)/(r-1)."""
    if b is None:
        b = 1.0 - 1.0 / r
    idx = np.arange(r ** 3)
    vsize = (b - a) / (r - 1)
    samples = np.stack([
        (idx // (r * r)) * vsize + a,
        ((idx // r) % r) * vsize + a,
        (idx % r) * vsize + a,
    ], axis=1).astype(np.float32)
    return jnp.asarray(samples)


def block_lattice(r: int) -> jnp.ndarray:
    """The (2r)^3 meshing lattice in voxel-center-relative coordinates: spans a
    half-voxel margin on each side (reference map.py:640-646 with the
    ``relative_network_offset`` shift)."""
    sample_a = -(r // 2) * (1.0 / r)
    sample_b = 1.0 + ((r - 1) // 2) * (1.0 / r)
    return get_samples(2 * r, a=sample_a, b=sample_b) - 0.5
