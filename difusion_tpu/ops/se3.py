"""In-jit SE(3) math (jax).

The tracker's Gauss-Newton loop runs entirely on device, so twist updates and
pose composition must be traceable. Poses are (R, t) pairs of jnp arrays.
Twists are ``xi = [rho, phi]`` matching host-side
:mod:`difusion_tpu.utils.motion`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pose(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) -> (N, 3)."""
        return pts @ self.R.T + self.t[None, :]

    def compose(self, other: "Pose") -> "Pose":
        return Pose(self.R @ other.R, self.R @ other.t + self.t)

    def inv(self) -> "Pose":
        Rt = self.R.T
        return Pose(Rt, -(Rt @ self.t))

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def so3_wedge(phi: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros((), dtype=phi.dtype)
    return jnp.array([
        [z, -phi[2], phi[1]],
        [phi[2], z, -phi[0]],
        [-phi[1], phi[0], z],
    ])


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with a Taylor branch near zero (branchless via where)."""
    angle2 = jnp.dot(phi, phi)
    angle = jnp.sqrt(angle2 + 1e-32)
    W = so3_wedge(phi)
    # sin(a)/a and (1-cos(a))/a^2 with stable small-angle limits.
    sinc = jnp.where(angle < 1e-5, 1.0 - angle2 / 6.0, jnp.sin(angle) / angle)
    cosc = jnp.where(angle < 1e-5, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / angle2)
    return jnp.eye(3, dtype=phi.dtype) + sinc * W + cosc * (W @ W)


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    angle2 = jnp.dot(phi, phi)
    angle = jnp.sqrt(angle2 + 1e-32)
    W = so3_wedge(phi)
    # J = I + (1-cos a)/a^2 W + (a - sin a)/a^3 W^2
    c1 = jnp.where(angle < 1e-5, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / angle2)
    c2 = jnp.where(angle < 1e-5, 1.0 / 6.0 - angle2 / 120.0, (angle - jnp.sin(angle)) / (angle2 * angle))
    return jnp.eye(3, dtype=phi.dtype) + c1 * W + c2 * (W @ W)


def exp_twist(xi: jnp.ndarray) -> Pose:
    """se(3) exponential: xi = [rho, phi] -> Pose. Matches
    ``Isometry.from_twist`` (reference: pytorch/utils/motion_util.py:205-210)."""
    rho, phi = xi[:3], xi[3:6]
    R = so3_exp(phi)
    t = so3_left_jacobian(phi) @ rho
    return Pose(R, t)
