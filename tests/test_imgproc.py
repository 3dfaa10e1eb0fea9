"""Golden tests for the image-processing ops against direct NumPy
re-computation of the reference CUDA semantics
(pytorch/system/ext/imgproc/{imgproc.cu,photometric.cu})."""
import numpy as np
import jax.numpy as jnp
import pytest

from difusion_tpu.ops import imgproc


def _rand_depth(rng, h, w, holes=0.1):
    d = rng.uniform(0.5, 4.0, (h, w)).astype(np.float32)
    ok = rng.uniform(size=(h, w)) > holes
    return d, ok


def test_unproject_depth_golden():
    rng = np.random.default_rng(0)
    h, w = 12, 16
    fx, fy, cx, cy = 10.0, 11.0, 8.0, 6.0
    d, ok = _rand_depth(rng, h, w)
    pc = np.asarray(imgproc.unproject_depth(jnp.asarray(d), jnp.asarray(ok), fx, fy, cx, cy))
    for v in range(h):
        for u in range(w):
            if ok[v, u]:
                assert np.allclose(pc[v, u], [(u - cx) / fx * d[v, u],
                                              (v - cy) / fy * d[v, u], d[v, u]], atol=1e-5)


def test_filter_depth_preserves_flat_region():
    d = np.full((10, 10), 2.0, np.float32)
    ok = np.ones((10, 10), bool)
    out, _ = imgproc.filter_depth(jnp.asarray(d), jnp.asarray(ok))
    assert np.allclose(np.asarray(out), 2.0, atol=1e-5)


def test_filter_depth_golden_interior_pixel():
    rng = np.random.default_rng(1)
    d = rng.uniform(1.0, 1.05, (7, 7)).astype(np.float32)
    ok = np.ones((7, 7), bool)
    out = np.asarray(imgproc.filter_depth(jnp.asarray(d), jnp.asarray(ok))[0])
    v, u = 3, 3
    z = d[v, u]
    sigma_z = 1.0 / (0.0012 + 0.0019 * (z - 0.4) ** 2 + 0.0001 / np.sqrt(z) * 0.25)
    w_sum = f_sum = 0.0
    for i in range(-2, 3):
        for j in range(-2, 3):
            nn = d[v + i, u + j]
            wgt = np.exp(-0.5 * ((abs(i) + abs(j)) * 1.2232 ** 2 + (nn - z) ** 2 * sigma_z ** 2))
            w_sum += wgt
            f_sum += wgt * nn
    assert np.isclose(out[v, u], f_sum / w_sum, atol=1e-5)


def test_normals_on_plane():
    """Points on z = const plane -> normal (0, 0, +-1)."""
    h, w = 10, 12
    fx = fy = 100.0   # pixel spacing z/f = 2 cm so the robust variant's
    cx, cy = 6.0, 5.0  # 0.1 m neighbor gate keeps the whole 7x7 window
    d = np.full((h, w), 2.0, np.float32)
    ok = np.ones((h, w), bool)
    pc = imgproc.unproject_depth(jnp.asarray(d), jnp.asarray(ok), fx, fy, cx, cy)
    normal, weight, nok = imgproc.compute_normal_weight(pc, jnp.asarray(ok))
    normal, nok = np.asarray(normal), np.asarray(nok)
    assert nok[1:-1, 1:-1].all()
    assert np.allclose(np.abs(normal[1:-1, 1:-1, 2]), 1.0, atol=1e-5)
    assert np.asarray(weight)[2, 2] > 0

    normal_r, weight_r, rok = imgproc.compute_normal_weight_robust(pc, jnp.asarray(ok))
    normal_r, rok = np.asarray(normal_r), np.asarray(rok)
    assert rok[3:-3, 3:-3].all()
    assert np.allclose(np.abs(normal_r[3:-3, 3:-3, 2]), 1.0, atol=1e-4)
    # robust variant flips towards camera (-z view direction)
    assert np.allclose(normal_r[3:-3, 3:-3, 2], -1.0, atol=1e-4)


def test_sym3eig_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(50, 3, 3)).astype(np.float32)
    cov = np.einsum("nij,nkj->nik", a, a)
    vec, lam = imgproc.sym3eig_smallest(jnp.asarray(cov))
    vec, lam = np.asarray(vec), np.asarray(lam)
    wref, vref = np.linalg.eigh(cov)
    assert np.allclose(lam, wref[:, 0], rtol=2e-2, atol=2e-3)
    dots = np.abs(np.sum(vec * vref[:, :, 0], axis=-1))
    assert np.all(dots > 0.99)


def test_gradient_xy_golden():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(8, 9)).astype(np.float32)
    grad, ok = imgproc.gradient_xy(jnp.asarray(img))
    grad, ok = np.asarray(grad), np.asarray(ok)
    v, u = 4, 4
    gx = ((img[v - 1, u + 1] - img[v - 1, u - 1]) + 2 * (img[v, u + 1] - img[v, u - 1])
          + (img[v + 1, u + 1] - img[v + 1, u - 1])) / 8.0
    gy = ((img[v + 1, u - 1] - img[v - 1, u - 1]) + 2 * (img[v + 1, u] - img[v - 1, u])
          + (img[v + 1, u + 1] - img[v - 1, u + 1])) / 8.0
    assert np.isclose(grad[v, u, 0], gx, atol=1e-6)
    assert np.isclose(grad[v, u, 1], gy, atol=1e-6)
    assert not ok[0, 0] and ok[1, 1]


def test_rgb_odometry_identity_warp():
    """Identity relative pose: residual is cur - prev at the same pixel."""
    rng = np.random.default_rng(4)
    h, w = 16, 20
    prev_i = rng.uniform(size=(h, w)).astype(np.float32)
    cur_i = prev_i + 0.01 * rng.normal(size=(h, w)).astype(np.float32)
    depth = rng.uniform(1.0, 3.0, (h, w)).astype(np.float32)
    ok = np.ones((h, w), bool)
    grad, gok = imgproc.gradient_xy(jnp.asarray(cur_i))
    intr = jnp.asarray([10.0, 10.0, w / 2.0, h / 2.0])
    f, J, fok = imgproc.rgb_odometry(
        jnp.asarray(prev_i), jnp.asarray(depth), jnp.asarray(ok),
        jnp.asarray(cur_i), jnp.asarray(depth), jnp.asarray(ok),
        grad, gok, intr, jnp.eye(3), jnp.zeros(3),
        min_grad_scale=0.0, max_depth_delta=0.2)
    f, fok = np.asarray(f), np.asarray(fok)
    assert fok[1:-1, 1:-1].all()
    assert np.allclose(f[fok], (cur_i - prev_i)[fok], atol=1e-6)


def test_rgb_odometry_jacobian_finite_difference():
    """J should predict the residual change under a small twist applied to the
    warp (numeric check through the KRK^-1 warp construction)."""
    from difusion_tpu.utils.motion import Isometry
    rng = np.random.default_rng(5)
    h, w = 24, 32
    fx = fy = 25.0
    cx, cy = w / 2.0, h / 2.0
    # smooth intensity field so round-to-nearest warping stays differentiable
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    prev_i = np.sin(uu / 7.0) * np.cos(vv / 5.0)
    prev_i = prev_i.astype(np.float32)
    cur_i = prev_i.copy()
    depth = np.full((h, w), 2.0, np.float32)
    ok = np.ones((h, w), bool)
    grad, gok = imgproc.gradient_xy(jnp.asarray(cur_i))
    intr = jnp.asarray([fx, fy, cx, cy])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    def energy(xi):
        delta = Isometry.from_twist(xi)
        R = delta.q.rotation_matrix
        t = delta.t
        krkinv = K @ R @ np.linalg.inv(K)
        kt = K @ t
        f, _, fok = imgproc.rgb_odometry(
            jnp.asarray(prev_i), jnp.asarray(depth), jnp.asarray(ok),
            jnp.asarray(cur_i), jnp.asarray(depth), jnp.asarray(ok),
            grad, gok, intr, jnp.asarray(krkinv), jnp.asarray(kt),
            min_grad_scale=0.0, max_depth_delta=10.0)
        return np.asarray(f), np.asarray(fok)

    f0, fok0 = energy(np.zeros(6))
    _, J, _ = imgproc.rgb_odometry(
        jnp.asarray(prev_i), jnp.asarray(depth), jnp.asarray(ok),
        jnp.asarray(cur_i), jnp.asarray(depth), jnp.asarray(ok),
        grad, gok, intr, jnp.eye(3), jnp.zeros(3),
        min_grad_scale=0.0, max_depth_delta=10.0)
    J = np.asarray(J)

    # the warp rounds to the nearest pixel, so the step must move the image by
    # >1 px for a finite difference to see anything (fx*eps/z = 1.5 px here);
    # central differences + aggregate comparison absorb the quantization noise
    eps = 0.12
    for k in [0, 1, 5]:   # x/y translation + in-plane rotation
        xi = np.zeros(6)
        xi[k] = eps
        f_plus, ok_plus = energy(xi)
        f_minus, ok_minus = energy(-xi)
        both = fok0 & ok_plus & ok_minus
        # emitted J is already df/dxi (kernel's -xi derivative, negation folded)
        pred = J[..., k][both].mean()
        num = ((f_plus - f_minus)[both] / (2 * eps)).mean()
        assert np.isclose(pred, num, rtol=0.3, atol=5e-3), (k, pred, num)


def test_rgb_odometry_tiled_matches_packed():
    """The block-tiled warp texture path must agree with the per-pixel packed
    path bit-for-bit on every pixel it keeps, keep the overwhelming majority
    of pixels under a realistic warp, and only ever DROP pixels (never add)."""
    from difusion_tpu.utils.motion import Isometry
    rng = np.random.default_rng(11)
    h, w = 48, 64
    fx = fy = 40.0
    cx, cy = w / 2.0, h / 2.0
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    prev_i = (np.sin(uu / 3.0) * np.cos(vv / 4.0)
              + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    cur_i = np.roll(prev_i, (1, 1), axis=(0, 1))
    # smooth depth with a hard step (a depth discontinuity exercises the
    # block-divergence invalidation)
    depth = (2.0 + 0.2 * np.sin(uu / 5.0)).astype(np.float32)
    depth[:, 40:] += 1.5
    ok = np.ones((h, w), bool)
    grad, gok = imgproc.gradient_xy(jnp.asarray(cur_i))
    intr = jnp.asarray([fx, fy, cx, cy])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    delta = Isometry.from_twist(np.array([0.02, -0.015, 0.01,
                                          0.004, -0.003, 0.006]))
    krkinv = jnp.asarray(K @ delta.q.rotation_matrix @ np.linalg.inv(K))
    kt = jnp.asarray(K @ delta.t)

    kw = dict(min_grad_scale=0.0, max_depth_delta=0.5)
    f_p, J_p, ok_p = imgproc.rgb_odometry(
        jnp.asarray(prev_i), jnp.asarray(depth), None,
        jnp.asarray(cur_i), jnp.asarray(depth), jnp.asarray(ok),
        grad, gok, intr, krkinv, kt, **kw,
        prev_tex=imgproc.warp_texture(jnp.asarray(prev_i),
                                      jnp.asarray(depth)))
    planes = imgproc.make_tiled_frame_planes(
        jnp.asarray(cur_i), jnp.asarray(depth), jnp.asarray(ok), grad, gok)
    f_t3, J_t3, ok_t3 = imgproc.rgb_odometry_tiled(
        planes, imgproc.warp_texture_tiled(jnp.asarray(prev_i),
                                           jnp.asarray(depth)),
        intr, krkinv, kt, **kw)
    f_p, J_p, ok_p = map(np.asarray, (f_p, J_p, ok_p))
    f_t3, J_t3, ok_t3 = map(np.asarray, (f_t3, J_t3, ok_t3))

    # un-permute the plane layout: plane P=p*2+q entry [a, b] is pixel
    # (2a+p, 2b+q)
    f_t = np.zeros_like(f_p)
    J_t = np.zeros_like(J_p)
    ok_t = np.zeros_like(ok_p)
    for P, (p, q) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        f_t[p::2, q::2] = f_t3[P]
        ok_t[p::2, q::2] = ok_t3[P]
        J_t[p::2, q::2] = np.moveaxis(J_t3[:, P], 0, -1)

    assert not np.any(ok_t & ~ok_p)              # tiled only drops pixels
    kept = ok_t
    assert kept.sum() >= 0.97 * ok_p.sum()       # ...and very few of them
    assert np.array_equal(f_t[kept], f_p[kept])  # bit-exact where kept
    assert np.array_equal(J_t[kept], J_p[kept])


def test_quantized_bf16_texture_is_bit_exact_on_sensor_grid():
    """warp_texture_tiled_quantized (one bf16 MXU pass over the byte planes)
    must reproduce the f32 warp_texture_tiled path EXACTLY when intensity
    sits on the uint8 grid and depth on the uint16 sensor grid -- the
    quantized packed pipeline's invariant."""
    from difusion_tpu.utils.motion import Isometry
    rng = np.random.default_rng(13)
    h, w = 48, 64
    fx = fy = 40.0
    cx, cy = w / 2.0, h / 2.0
    dcam = 5000.0
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # sensor-grid frames: u8 intensity, u16 depth units
    prev_u8 = np.clip((np.sin(uu / 3.0) * np.cos(vv / 4.0) * 0.5 + 0.5)
                      * 255 + rng.integers(0, 8, (h, w)), 0, 255).astype(np.uint8)
    d16 = (np.clip(2.0 + 0.2 * np.sin(uu / 5.0), 0.5, 5.0)
           * dcam).astype(np.uint16)
    prev_i = jnp.asarray(prev_u8.astype(np.float32) * (1.0 / 255.0))
    depth = jnp.asarray(d16.astype(np.float32) * np.float32(1.0 / dcam))
    cur_i = jnp.roll(prev_i, (1, 1), axis=(0, 1))
    ok = jnp.ones((h, w), bool)
    grad, gok = imgproc.gradient_xy(cur_i)
    intr = jnp.asarray([fx, fy, cx, cy])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    delta = Isometry.from_twist(np.array([0.02, -0.015, 0.01,
                                          0.004, -0.003, 0.006]))
    krkinv = jnp.asarray(K @ delta.q.rotation_matrix @ np.linalg.inv(K))
    kt = jnp.asarray(K @ delta.t)
    planes = imgproc.make_tiled_frame_planes(cur_i, depth, ok, grad, gok)

    kw = dict(min_grad_scale=0.0, max_depth_delta=0.5)
    f_a, J_a, ok_a = imgproc.rgb_odometry_tiled(
        planes, imgproc.warp_texture_tiled(prev_i, depth),
        intr, krkinv, kt, **kw)
    tex_q = imgproc.warp_texture_tiled_quantized(prev_i, depth, dcam)
    assert tex_q.dtype == jnp.bfloat16 and tex_q.shape[-1] == 75
    f_b, J_b, ok_b = imgproc.rgb_odometry_tiled(
        planes, tex_q, intr, krkinv, kt, dcam_scale=dcam, **kw)
    assert np.array_equal(np.asarray(ok_a), np.asarray(ok_b))
    assert np.array_equal(np.asarray(f_a), np.asarray(f_b))
    assert np.array_equal(np.asarray(J_a), np.asarray(J_b))


def test_pyramid_shapes_and_downsampling():
    rng = np.random.default_rng(6)
    h, w = 32, 48
    inten = rng.uniform(size=(h, w)).astype(np.float32)
    depth = rng.uniform(1, 3, (h, w)).astype(np.float32)
    ok = np.ones((h, w), bool)
    pyr = imgproc.make_image_pyramid(jnp.asarray(inten), jnp.asarray(depth), jnp.asarray(ok))
    assert pyr.intensity[1].shape == (16, 24)
    assert pyr.intensity[2].shape == (8, 12)
    # bilinear /2 == 2x2 mean (torch align_corners=False)
    expect = inten.reshape(16, 2, 24, 2).mean(axis=(1, 3))
    assert np.allclose(np.asarray(pyr.intensity[1]), expect, atol=1e-6)
    # nearest /2 == stride-2 sampling (torch nearest src = floor(2*dst))
    assert np.allclose(np.asarray(pyr.depth[1]), depth[::2, ::2])
