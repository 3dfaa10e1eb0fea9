"""Golden tests for quaternion / SE(3) math, cross-checked against scipy and
against the jax in-jit implementations."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from difusion_tpu.utils import motion as M


RNG = np.random.default_rng(0)


def random_rotation():
    return Rotation.random(random_state=42).as_matrix()


class TestQuaternion:
    def test_matrix_round_trip(self):
        for _ in range(20):
            R = Rotation.random(random_state=RNG.integers(1 << 30)).as_matrix()
            q = M.Quaternion(matrix=R)
            np.testing.assert_allclose(q.rotation_matrix, R, atol=1e-10)

    def test_axis_angle(self):
        q = M.Quaternion(axis=[0, 0, 1], degrees=90.0)
        np.testing.assert_allclose(q.rotate([1, 0, 0]), [0, 1, 0], atol=1e-12)

    def test_mul_matches_matrix_product(self):
        q1 = M.Quaternion.random(RNG)
        q2 = M.Quaternion.random(RNG)
        np.testing.assert_allclose((q1 * q2).rotation_matrix,
                                   q1.rotation_matrix @ q2.rotation_matrix, atol=1e-10)

    def test_inverse(self):
        q = M.Quaternion.random(RNG)
        np.testing.assert_allclose((q * q.inverse).rotation_matrix, np.eye(3), atol=1e-10)

    def test_slerp_endpoints(self):
        q1, q2 = M.Quaternion.random(RNG), M.Quaternion.random(RNG)
        np.testing.assert_allclose(M.Quaternion.slerp(q1, q2, 0.0).rotation_matrix,
                                   q1.rotation_matrix, atol=1e-8)
        np.testing.assert_allclose(M.Quaternion.slerp(q1, q2, 1.0).rotation_matrix,
                                   q2.rotation_matrix, atol=1e-8)


class TestLie:
    def test_so3_exp_log_roundtrip(self):
        for _ in range(10):
            phi = RNG.normal(size=3) * 0.5
            R = M.so3_exp(phi)
            np.testing.assert_allclose(M.so3_log(R), phi, atol=1e-8)

    def test_so3_exp_matches_scipy(self):
        phi = np.array([0.3, -0.2, 0.9])
        np.testing.assert_allclose(M.so3_exp(phi), Rotation.from_rotvec(phi).as_matrix(), atol=1e-10)

    def test_twist_exp_log_roundtrip(self):
        xi = RNG.normal(size=6) * 0.4
        iso = M.Isometry.from_twist(xi)
        np.testing.assert_allclose(iso.log(), xi, atol=1e-8)

    def test_left_jacobian_inverse(self):
        phi = RNG.normal(size=3)
        np.testing.assert_allclose(M.so3_left_jacobian(phi) @ M.so3_inv_left_jacobian(phi),
                                   np.eye(3), atol=1e-9)

    def test_se3_left_jacobian_inverse(self):
        xi = RNG.normal(size=6)
        np.testing.assert_allclose(M.se3_left_jacobian(xi) @ M.se3_inv_left_jacobian(xi),
                                   np.eye(6), atol=1e-8)


class TestIsometry:
    def test_compose_inverse(self):
        a, b = M.Isometry.random(RNG), M.Isometry.random(RNG)
        c = a.dot(b)
        np.testing.assert_allclose(c.matrix, a.matrix @ b.matrix, atol=1e-10)
        np.testing.assert_allclose(a.inv().dot(a).matrix, np.eye(4), atol=1e-10)

    def test_apply_points(self):
        iso = M.Isometry.random(RNG)
        pts = RNG.normal(size=(10, 3))
        expected = (iso.q.rotation_matrix @ pts.T).T + iso.t
        np.testing.assert_allclose(iso @ pts, expected, atol=1e-10)

    def test_twist_small_angle(self):
        xi = np.array([1e-9, 0, 0, 0, 0, 1e-10])
        iso = M.Isometry.from_twist(xi)
        np.testing.assert_allclose(iso.matrix[:3, 3], xi[:3], atol=1e-12)

    def test_matmul_isometry(self):
        a, b = M.Isometry.random(RNG), M.Isometry.random(RNG)
        np.testing.assert_allclose((a @ b).matrix, a.dot(b).matrix, atol=1e-12)

    def test_continuous_repr_roundtrip(self):
        iso = M.Isometry.random(RNG)
        rec = M.Isometry.from_continuous_repr(iso.continuous_repr)
        np.testing.assert_allclose(rec.matrix, iso.matrix, atol=1e-9)


class TestJaxSE3:
    def test_exp_twist_matches_host(self):
        import jax.numpy as jnp
        from difusion_tpu.ops import se3

        for scale in [1.0, 1e-3, 1e-8]:
            xi = RNG.normal(size=6) * scale
            pose = se3.exp_twist(jnp.asarray(xi, dtype=jnp.float64 if False else jnp.float32))
            iso = M.Isometry.from_twist(xi)
            np.testing.assert_allclose(np.asarray(pose.R), iso.q.rotation_matrix, atol=2e-6)
            np.testing.assert_allclose(np.asarray(pose.t), iso.t, atol=2e-6)

    def test_pose_ops(self):
        import jax.numpy as jnp
        from difusion_tpu.ops import se3

        a = M.Isometry.random(RNG)
        pa = se3.Pose(jnp.asarray(a.q.rotation_matrix, jnp.float32), jnp.asarray(a.t, jnp.float32))
        pts = RNG.normal(size=(5, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(pa.apply(jnp.asarray(pts))), a @ pts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pa.compose(pa.inv()).R), np.eye(3), atol=1e-5)


def test_ate_rmse_zero_for_identical():
    traj = [M.Isometry.random(RNG) for _ in range(10)]
    assert M.ate_rmse(traj, traj) < 1e-9


def test_ate_rmse_alignment_invariance():
    traj = [M.Isometry.random(RNG) for _ in range(10)]
    offset = M.Isometry.random(RNG)
    moved = [offset.dot(t) for t in traj]
    assert M.ate_rmse(traj, moved, align=True) < 1e-9
