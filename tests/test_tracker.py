"""Tracker tests: preprocessing on synthetic geometry, GN term gradient
consistency, and end-to-end two-frame pose recovery with the reference prior
(capability parity with pytorch/system/tracker.py)."""
import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from difusion_tpu.core import map as M
from difusion_tpu.core import tracker as T
from difusion_tpu.models.decoder import DecoderSpec, init_decoder_params, fold_decoder_params
from difusion_tpu.models.encoder import EncoderSpec, init_encoder_params, fold_encoder_params
from difusion_tpu.ops.imgproc import Intrinsic
from difusion_tpu.ops.se3 import Pose, exp_twist
from difusion_tpu.utils.motion import Isometry, Quaternion

SPEC_D = DecoderSpec()
SPEC_E = EncoderSpec()


def small_cfg(**kw):
    defaults = dict(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                    voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                    prune_min_vox_obs=4, ignore_count_th=2.0,
                    encoder_count_th=600.0)
    defaults.update(kw)
    return M.MapConfig(**defaults)


def render_surface_frame(pose: Isometry, calib: Intrinsic, h=120, w=160,
                         corrugation=0.0):
    """Depth+intensity of a textured surface z = 2 + corrugation-relief seen
    by ``pose`` (camera-to-world).  A flat wall (corrugation=0) exercises
    preprocessing; a corrugated one constrains all 6 DoF for the SDF term.
    Returns (rgb, depth, ok)."""
    cam_R = pose.q.rotation_matrix
    cam_t = pose.t
    u = np.arange(w)
    v = np.arange(h)
    uu, vv = np.meshgrid(u, v)
    rays = np.stack([(uu - calib.cx) / calib.fx,
                     (vv - calib.cy) / calib.fy,
                     np.ones_like(uu, np.float64)], axis=-1)   # camera dirs (z=1)
    dirs_w = rays @ cam_R.T

    def relief(x, y):
        return corrugation * (np.sin(5.0 * x) + 0.7 * np.cos(4.0 * y))

    # fixed-point solve for ray-surface intersection s: z(s) = 2 + relief(x(s), y(s))
    s = (2.0 - cam_t[2]) / dirs_w[..., 2]
    for _ in range(30):
        p = cam_t[None, None] + s[..., None] * dirs_w
        s = (2.0 + relief(p[..., 0], p[..., 1]) - cam_t[2]) / dirs_w[..., 2]
    ok = s > 0.1
    depth = np.where(ok, s, 0.0).astype(np.float32)  # camera z = s (ray z = 1)
    pts_w = cam_t[None, None] + s[..., None] * dirs_w
    # texture from world x/y so the photometric term pins in-plane motion
    tex = 0.5 + 0.25 * np.sin(pts_w[..., 0] * 17.0) + 0.25 * np.cos(pts_w[..., 1] * 13.0)
    rgb = np.repeat(np.clip(tex, 0, 1).astype(np.float32)[..., None], 3, axis=-1)
    return (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(ok))


def render_plane_frame(pose, calib, h=120, w=160):
    return render_surface_frame(pose, calib, h, w, corrugation=0.0)


# fx chosen so the subsampled pixel spacing at z=2 (2/150 = 13 mm) keeps >=16
# neighbors within the 5 cm outlier radius, like real ICL-NUIM intrinsics do
CALIB = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)


def test_preprocess_plane_frame():
    pose = Isometry()  # camera at origin looking +z
    rgb, depth, ok = render_plane_frame(pose, CALIB)
    tcfg = T.TrackerConfig(point_budget=4096)
    out = T.preprocess_frame(tcfg, CALIB, rgb, depth)
    mask = np.asarray(out.pc_mask)
    pts = np.asarray(out.pts_cam)[mask]
    nrm = np.asarray(out.normals_cam)[mask]
    assert mask.sum() > 200
    assert np.allclose(pts[:, 2], 2.0, atol=1e-2)
    # wall normal faces the camera (-z) after the camera-facing flip
    assert np.allclose(nrm[:, 2], -1.0, atol=0.05)
    # pyramid levels exist with halved sizes
    assert out.pyramid.intensity[1].shape == (60, 80)


def _random_map_with_latents(cfg, seed=0):
    """Map whose allocated slots carry random latents with converged counts
    (valid everywhere a query lands), for gradient tests with a random
    decoder."""
    rng = np.random.default_rng(seed)
    state = M.create_map_state(cfg)
    indexer = np.full(cfg.n_cells, -1, np.int32)
    n_slots = 2048
    cells = rng.choice(cfg.n_cells, size=n_slots, replace=False)
    indexer[cells] = np.arange(n_slots)
    positions = np.full(cfg.capacity, -1, np.int32)
    positions[:n_slots] = cells
    latents = np.zeros((cfg.capacity, cfg.latent_dim), np.float32)
    latents[:n_slots] = rng.normal(size=(n_slots, cfg.latent_dim)).astype(np.float32) * 0.1
    counts = np.zeros(cfg.capacity, np.float32)
    counts[:n_slots] = 100.0
    return state._replace(
        indexer=jnp.asarray(indexer), positions=jnp.asarray(positions),
        latents=jnp.asarray(latents), obs_count=jnp.asarray(counts)), cells


def test_sdf_term_gradient_consistency():
    """g must equal dE/dxi / 2 for the left-multiplied update
    delta <- exp(xi) o delta (validates the [G | y x G] twist chain)."""
    cfg = small_cfg()
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    state, cells = _random_map_with_latents(cfg)

    rng = np.random.default_rng(1)
    # query points inside allocated cells so everything is valid
    cell_xyz = np.stack(np.unravel_index(cells[:256], cfg.n_xyz), axis=1)
    pts = (cell_xyz + rng.uniform(0.3, 0.7, (256, 3))) * cfg.voxel_size \
        + np.asarray(cfg.bound_min)
    pts = jnp.asarray(pts.astype(np.float32))
    mask = jnp.ones(256, bool)

    last = Pose(jnp.asarray(Isometry.random(np.random.default_rng(2)).q.rotation_matrix.astype(np.float32)),
                jnp.zeros(3, jnp.float32))
    # keep points fixed in world: apply last^-1 so last o delta o pts' = pts
    pts_cam = (pts - last.t) @ last.R   # R^T applied -> last.apply(pts_cam) = pts
    delta0 = Pose.identity()

    def energy(xi):
        upd = exp_twist(jnp.asarray(xi, jnp.float32))
        d = Pose(upd.R @ delta0.R, upd.R @ delta0.t + upd.t)
        _, _, E = T._sdf_term(cfg, dec, SPEC_D, state, last, d, pts_cam, mask,
                              robust_kernel="", robust_k=0.0)
        return float(E)

    _, g, _ = T._sdf_term(cfg, dec, SPEC_D, state, last, delta0, pts_cam, mask,
                          robust_kernel="", robust_k=0.0)
    g = np.asarray(g)
    eps = 1e-4
    for k in range(6):
        xi = np.zeros(6)
        xi[k] = eps
        dE = (energy(xi) - energy(-xi)) / (2 * eps)
        assert np.isclose(2 * g[k], dE, rtol=5e-2, atol=1e-4), (k, 2 * g[k], dE)


def test_sdf_term_fused_matches_vjp():
    """The fused Pallas decode+gradient SDF term (round-3 verdict item 5)
    must reproduce the XLA forward+vjp term's H, g, E at f32 tolerance
    (interpret mode on CPU; the kernel itself is parity-tested in
    tests/test_decoder_fused.py)."""
    cfg = small_cfg()
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    state, cells = _random_map_with_latents(cfg)

    rng = np.random.default_rng(5)
    cell_xyz = np.stack(np.unravel_index(cells[:512], cfg.n_xyz), axis=1)
    pts = (cell_xyz + rng.uniform(0.1, 0.9, (512, 3))) * cfg.voxel_size \
        + np.asarray(cfg.bound_min)
    pts = jnp.asarray(pts.astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=512) > 0.1)

    last = Pose(jnp.asarray(Isometry.random(np.random.default_rng(6))
                            .q.rotation_matrix.astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.01, 3).astype(np.float32)))
    delta = exp_twist(jnp.asarray(
        rng.normal(0, 0.005, 6).astype(np.float32)))
    pts_cam = (pts - last.t) @ last.R

    kw = dict(robust_kernel="huber", robust_k=5.0)
    H0, g0, E0 = T._sdf_term(cfg, dec, SPEC_D, state, last, delta, pts_cam,
                             mask, fused=False, **kw)
    H1, g1, E1 = T._sdf_term(cfg, dec, SPEC_D, state, last, delta, pts_cam,
                             mask, fused=True, **kw)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
    np.testing.assert_allclose(float(E1), float(E0), atol=1e-5)


def test_compsum_engages_and_is_order_independent():
    """The pairwise-TwoSum cascade must (a) beat a plain f32 sum by orders
    of magnitude on a cancellation-heavy case -- this also guards against
    XLA ever algebraically simplifying the error term away -- and (b) be
    invariant to input permutation at ~1 ulp."""
    from difusion_tpu.ops.compsum import gram_compensated, pairwise_compensated_sum
    rng = np.random.default_rng(0)
    x = rng.standard_normal(40001).astype(np.float32) * 1e4
    x = np.concatenate([x, -x * (1 + 1e-7)]).astype(np.float32)
    exact = np.sum(x.astype(np.float64))
    plain = float(jnp.sum(jnp.asarray(x)))
    comp = float(jax.jit(pairwise_compensated_sum)(jnp.asarray(x)))
    assert abs(comp - exact) < 1e-4 * max(abs(plain - exact), 1e-30), \
        (comp, plain, exact)
    perm = rng.permutation(len(x))
    comp_p = float(jax.jit(pairwise_compensated_sum)(jnp.asarray(x[perm])))
    assert abs(comp_p - comp) <= 1e-6 * abs(exact) + 1e-7

    # gram vs f64 ground truth
    rows = rng.standard_normal((3000, 7)).astype(np.float32)
    w = rng.random(3000).astype(np.float32)
    Mc = np.asarray(jax.jit(lambda r, w: gram_compensated(r, w, 1.0))(rows, w))
    M64 = (rows.astype(np.float64) * w[:, None]).T @ rows.astype(np.float64)
    np.testing.assert_allclose(Mc, M64, rtol=5e-6, atol=1e-6)
    assert np.array_equal(Mc, Mc.T)

    # blocked gram: same f64 agreement (cross-block error is captured
    # exactly; within-block is a 512-term f32 sum)
    from difusion_tpu.ops.compsum import gram_blocked
    Mb = np.asarray(jax.jit(lambda r, w: gram_blocked(r, w, 1.0))(rows, w))
    np.testing.assert_allclose(Mb, M64, rtol=5e-6, atol=1e-6)
    # and N not a multiple of the block size pads with exact zeros
    # (slightly looser: within-block plain-f32 sums, not the 1-ulp cascade)
    Mb2 = np.asarray(jax.jit(
        lambda r, w: gram_blocked(r, w, 1.0, block=499))(rows, w))
    np.testing.assert_allclose(Mb2, M64, rtol=5e-5, atol=1e-6)


def test_compensated_sdf_term_order_robust():
    """solve_dtype='compensated' motivation (round-4 verdict missing #2):
    permuting the input point order must leave the compensated H, g
    essentially unchanged, while the plain-f32 path moves measurably.  This
    is the unit-scale version of the loop300 reduction-order band."""
    cfg = small_cfg()
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    state, cells = _random_map_with_latents(cfg)

    rng = np.random.default_rng(9)
    n = 4096
    cell_xyz = np.stack(np.unravel_index(
        rng.choice(cells, size=n), cfg.n_xyz), axis=1)
    pts = (cell_xyz + rng.uniform(0.1, 0.9, (n, 3))) * cfg.voxel_size \
        + np.asarray(cfg.bound_min)
    pts = pts.astype(np.float32)
    mask = jnp.ones(n, bool)
    last = Pose(jnp.eye(3), jnp.zeros(3))
    delta = Pose.identity()
    perm = rng.permutation(n)

    def term(p, mode):
        H, g, E = T._sdf_term(cfg, dec, SPEC_D, state, last, delta,
                              jnp.asarray(p), mask, robust_kernel="huber",
                              robust_k=5.0, gram_mode=mode)
        return np.asarray(H), np.asarray(g), float(E)

    Hp0, gp0, Ep0 = term(pts, "f32")
    Hp1, gp1, Ep1 = term(pts[perm], "f32")
    Hc0, gc0, Ec0 = term(pts, "compensated")
    Hc1, gc1, Ec1 = term(pts[perm], "compensated")
    Hb0, gb0, Eb0 = term(pts, "blocked")
    Hb1, gb1, Eb1 = term(pts[perm], "blocked")

    # compensated/blocked values agree with plain at f32 tolerance (same math)
    np.testing.assert_allclose(Hc0, Hp0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gc0, gp0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(Hb0, Hp0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gb0, gp0, rtol=1e-4, atol=1e-6)

    plain_moved = abs(Hp1 - Hp0).max() + abs(gp1 - gp0).max()
    comp_moved = abs(Hc1 - Hc0).max() + abs(gc1 - gc0).max()
    blk_moved = abs(Hb1 - Hb0).max() + abs(gb1 - gb0).max()
    # the permutation changes the decoder's gather order too, so plain
    # movement is guaranteed nonzero; compensated must be far tighter.
    # blocked is only refactor-stable by construction (permutation changes
    # block membership), so its movement is bounded absolutely by
    # within-block f32 rounding -- a few ulp of the largest H entry -- not
    # relative to the plain path (at this unit scale plain movement is
    # itself near the noise floor; the tracker-scale evidence is the
    # loop300 band A/B in ACCURACY_r05)
    assert comp_moved <= max(plain_moved * 0.1, 1e-9), \
        (plain_moved, comp_moved)
    scale_H = max(abs(Hp0).max(), abs(gp0).max())
    assert blk_moved <= 1e-5 * scale_H, (blk_moved, scale_H)


def test_solve_refine_reduces_residual():
    """Same-precision iterative refinement cannot undo the f32 rounding of
    H itself (that is the accumulation's job -- see the compensated tests
    above); what it must do is tighten the solver's own backward error:
    the preconditioned residual after refinement is no worse, and the
    solution stays accurate at GN-typical conditioning."""
    rng = np.random.default_rng(3)
    A = rng.standard_normal((6, 6))
    H64 = A @ np.diag([3.0, 2.0, 1.5, 1.0, 0.7, 0.5]) @ A.T
    x_true = rng.standard_normal(6)
    g64 = -(H64 @ x_true)
    H = jnp.asarray(H64.astype(np.float32))
    g = jnp.asarray(g64.astype(np.float32))

    def resid(x):
        return np.linalg.norm(H64 @ x + g64) / np.linalg.norm(g64)

    x0 = np.asarray(T._solve_precond(H, g, refine=False), np.float64)
    x1 = np.asarray(T._solve_precond(H, g, refine=True), np.float64)
    # both at the f32 noise floor; refinement must not leave it
    assert resid(x1) <= max(resid(x0) * 2.0, 1e-6)
    # the right bar: refinement approaches the EXACT solution of the
    # f32-stored system (storage error is the accumulation's business)
    x_best = np.linalg.solve(np.asarray(H, np.float64), -np.asarray(g, np.float64))
    assert (np.linalg.norm(x1 - x_best) <=
            max(np.linalg.norm(x0 - x_best), 1e-5 * np.linalg.norm(x_best)))


@pytest.mark.skipif(not conftest.reference_ckpt_available(),
                    reason="reference checkpoint unavailable")
@pytest.mark.slow
@pytest.mark.parametrize("variant", ["packed", "tiled", "strict"])
def test_two_frame_tracking_recovers_pose(variant):
    """Integrate a wall at a known pose, then track a second frame rendered
    from a perturbed camera; the GN solve should recover the true motion.
    Runs both warp texture layouts (per-pixel packed and block-tiled) plus
    the literal-parity numerics (round-to-nearest reprojection + full-res K
    at all levels, reference photometric.cu:44-55 / tracker.py:133-136)."""
    from difusion_tpu.models import torch_import as TI
    dec_t, enc_t, spec_d, spec_e, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))

    cfg = small_cfg(prune_min_vox_obs=4, ignore_count_th=1.0)
    kw = {"packed": dict(warp_tiled=False),
          "tiled": dict(warp_tiled=True),
          "strict": dict(warp_tiled=False, rgb_bilinear=False,
                         rgb_fullres_K=True)}[variant]
    tcfg = T.TrackerConfig(point_budget=8192, **kw)
    pose0 = Isometry()   # at origin, +z towards the wall at z=2

    rgb0, depth0, ok0 = render_surface_frame(pose0, CALIB, corrugation=0.1)
    tracker = T.SDFTracker(cfg, tcfg, dec, spec_d, CALIB)
    state = M.create_map_state(cfg)
    p0 = tracker.track_camera(state, rgb0, depth0, set_pose=pose0)

    # fuse frame 0 at its (ground-truth) pose
    w_pts, w_nrm, w_mask = tracker.last_pc_world(p0)
    state = M.integrate_keyframe(cfg, enc, state, w_pts, w_nrm, w_mask)
    assert int(state.n_occupied) > 50

    # second frame from a perturbed camera
    true_delta = Isometry.from_twist(np.array([0.01, -0.008, 0.012, 0.004, -0.003, 0.005]))
    pose1 = pose0.dot(true_delta)
    rgb1, depth1, ok1 = render_surface_frame(pose1, CALIB, corrugation=0.1)
    tracker.track_camera(state, rgb1, depth1)
    p1 = tracker.pose_at(-1)

    err = (p1.inv().dot(pose1)).log()
    t_err = np.linalg.norm(err[:3])
    r_err = np.linalg.norm(err[3:])
    assert t_err < 0.01, (t_err, p1, pose1)     # < 1 cm
    assert r_err < 0.01, (r_err,)               # < 0.6 deg


def test_robust_weight_kinds():
    x = jnp.asarray(np.array([-10.0, -2.0, 0.0, 2.0, 10.0], np.float32))
    w = np.asarray(T._robust_weight(x, "huber", 5.0))
    np.testing.assert_allclose(w, [0.5, 1.0, 1.0, 1.0, 0.5], atol=1e-6)
    w = np.asarray(T._robust_weight(x, "tukey", 5.0))
    np.testing.assert_allclose(w, [0.0, (1 - 0.16) ** 2, 1.0, (1 - 0.16) ** 2, 0.0],
                               atol=1e-6)
    w = np.asarray(T._robust_weight(x, "", 5.0))
    np.testing.assert_allclose(w, 1.0)


@pytest.mark.slow
def test_packed_preprocess_matches_direct():
    """pack_frame + preprocess_frame_packed must equal preprocess_frame: the
    uint8 mean intensity is the sensor's own quantization (half-step
    tolerance); float depth is re-quantized to the sensor's uint16 grid
    (half-step tolerance), native uint16 depth is exact."""
    pose = Isometry()
    rgb, depth, ok = render_surface_frame(pose, CALIB, corrugation=0.1)
    tcfg = T.TrackerConfig(point_budget=4096)
    rgb_u8 = (np.asarray(rgb) * 255).astype(np.uint8)

    direct = T.preprocess_frame(tcfg, CALIB, jnp.asarray(rgb_u8), depth)
    packed = jnp.asarray(T.pack_frame(rgb_u8, np.asarray(depth),
                                      CALIB.dcam_scale))
    via_packed = T.preprocess_frame_packed(tcfg, CALIB, packed,
                                           depth.shape[0], depth.shape[1])
    # float depth passes through a uint16 re-quantization (the sensor's own
    # grid): the depth pyramid must agree to half a step; downstream points
    # can shift box-filter cells, so compare the deterministic pyramid
    q = 0.5 / CALIB.dcam_scale
    np.testing.assert_allclose(np.asarray(direct.pyramid.depth[0]),
                               np.asarray(via_packed.pyramid.depth[0]),
                               atol=q + 1e-6)
    qi = 0.5 / 255.0
    np.testing.assert_allclose(np.asarray(direct.pyramid.intensity[0]),
                               np.asarray(via_packed.pyramid.intensity[0]),
                               atol=qi + 1e-6)

    d16 = (np.asarray(depth) * CALIB.dcam_scale).astype(np.uint16)
    direct16 = T.preprocess_frame(tcfg, CALIB, jnp.asarray(rgb_u8), jnp.asarray(d16))
    packed16 = jnp.asarray(T.pack_frame(rgb_u8, d16, CALIB.dcam_scale))
    via16 = T.preprocess_frame_packed(tcfg, CALIB, packed16,
                                      d16.shape[0], d16.shape[1])
    np.testing.assert_allclose(np.asarray(direct16.pts_cam),
                               np.asarray(via16.pts_cam), atol=1e-6)
    assert (np.asarray(direct16.pc_mask) == np.asarray(via16.pc_mask)).all()
    # intensity agrees to the u8 half-step (packed stores round(mean))
    np.testing.assert_allclose(np.asarray(direct16.pyramid.intensity[0]),
                               np.asarray(via16.pyramid.intensity[0]),
                               atol=qi + 1e-6)


def test_legacy_flat_packing_still_unpacks():
    """A flat 1-D byte stream (the pre-byte-plane pack_frame layout:
    intensity bytes then little-endian uint16 depth bytes) must unpack
    identically to the current (h, 3w) plane buffer -- backward
    compatibility for stored buffers."""
    rng = np.random.default_rng(11)
    h, w = 48, 64
    rgb_u8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    d16 = rng.integers(300, 20000, (h, w), dtype=np.uint16)
    tcfg = T.TrackerConfig(point_budget=256)

    planes = T.pack_frame(rgb_u8, d16, CALIB.dcam_scale)
    assert planes.shape == (h, 3 * w)
    intensity = planes[:, :w]
    legacy = np.concatenate([intensity.ravel(),
                             d16.view(np.uint8).ravel()])
    via_planes = T.preprocess_frame_packed(tcfg, CALIB, jnp.asarray(planes),
                                           h, w)
    via_legacy = T.preprocess_frame_packed(tcfg, CALIB, jnp.asarray(legacy),
                                           h, w)
    np.testing.assert_array_equal(np.asarray(via_planes.pyramid.depth[0]),
                                  np.asarray(via_legacy.pyramid.depth[0]))
    np.testing.assert_array_equal(
        np.asarray(via_planes.pyramid.intensity[0]),
        np.asarray(via_legacy.pyramid.intensity[0]))


@pytest.mark.slow
def test_lossless_packing_is_bit_exact():
    """pack_frame(lossless=True) + preprocess_frame_packed reproduces the
    direct preprocess_frame numerics EXACTLY on float inputs (the parity/
    debug opt-out for the quantized default packing)."""
    pose = Isometry()
    rgb, depth, ok = render_surface_frame(pose, CALIB, corrugation=0.1)
    tcfg = T.TrackerConfig(point_budget=4096)
    rgb_f = np.asarray(rgb, np.float32)

    direct = T.preprocess_frame(tcfg, CALIB, jnp.asarray(rgb_f), depth)
    packed = jnp.asarray(T.pack_frame(rgb_f, np.asarray(depth),
                                      CALIB.dcam_scale, lossless=True))
    assert packed.shape == (depth.shape[0], 16 * depth.shape[1])
    via = T.preprocess_frame_packed(tcfg, CALIB, packed,
                                    depth.shape[0], depth.shape[1])
    np.testing.assert_array_equal(np.asarray(direct.pyramid.depth[0]),
                                  np.asarray(via.pyramid.depth[0]))
    np.testing.assert_array_equal(np.asarray(direct.pyramid.intensity[0]),
                                  np.asarray(via.pyramid.intensity[0]))
    np.testing.assert_array_equal(np.asarray(direct.pts_cam),
                                  np.asarray(via.pts_cam))
    np.testing.assert_array_equal(np.asarray(direct.pc_mask),
                                  np.asarray(via.pc_mask))


@pytest.mark.slow
def test_pallas_window_stencil_matches_jnp():
    """The Pallas window-stat kernel (interpret mode on CPU) must match the
    jnp patch-stack formulation."""
    rng = np.random.default_rng(4)
    H, W = 48, 64
    pc = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    ok = jnp.asarray(rng.random((H, W)) > 0.2)
    a = T._window_stats(pc, ok, 3, 0.25, 4, 1.0, 3.0, backend="jnp")
    b = T._window_stats(pc, ok, 3, 0.25, 4, 1.0, 3.0,
                        backend="pallas_interpret")
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()          # outlier ok
    assert (np.asarray(a[2]) == np.asarray(b[2])).all()          # normal ok
    # random clouds give near-degenerate covariances (eigenvectors are
    # ill-conditioned under f32 summation order); check direction agreement
    na, nb = np.asarray(a[1]), np.asarray(b[1])
    m = np.asarray(a[2])
    dots = np.abs(np.sum(na[m] * nb[m], axis=-1))
    assert (dots > 0.99).mean() > 0.97, dots.min()

    # well-conditioned case: noisy plane -> normals must agree tightly
    z = 2.0 + 0.001 * rng.standard_normal((H, W)).astype(np.float32)
    u = np.arange(W, dtype=np.float32)[None, :] * 0.01
    v = np.arange(H, dtype=np.float32)[:, None] * 0.01
    plane = jnp.asarray(np.stack([u + 0 * z, v + 0 * z, z], axis=-1))
    okp = jnp.ones((H, W), bool)
    ap = T._window_stats(plane, okp, 3, 0.25, 4, 1.0, 3.0, backend="jnp")
    bp = T._window_stats(plane, okp, 3, 0.25, 4, 1.0, 3.0,
                         backend="pallas_interpret")
    mp_ = np.asarray(ap[2])
    dots = np.abs(np.sum(np.asarray(ap[1])[mp_] * np.asarray(bp[1])[mp_], -1))
    assert dots.min() > 0.9999, dots.min()


def test_scan_window_stencil_matches_jnp():
    """The scan-accumulator stencil (default) must match the patch-stack
    formulation exactly."""
    rng = np.random.default_rng(12)
    H, W = 48, 64
    pc = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    ok = jnp.asarray(rng.random((H, W)) > 0.2)
    a = T._window_stats(pc, ok, 3, 0.25, 4, 1.0, 3.0, backend="jnp")
    b = T._window_stats(pc, ok, 3, 0.25, 4, 1.0, 3.0, backend="scan")
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()
    assert (np.asarray(a[2]) == np.asarray(b[2])).all()
    m = np.asarray(a[2])
    dots = np.abs(np.sum(np.asarray(a[1])[m] * np.asarray(b[1])[m], axis=-1))
    assert (dots > 0.9999).mean() > 0.99, dots.min()


def test_gather_cache_and_unroll_match_baseline():
    """Round-4 verdict experiments (a)/(b): `sdf_gather_cache` (iteration-
    carried latent rows behind a scalar re-gather cond) and `gn_unroll=2`
    (loop body unrolled under a done-guard) must reproduce the baseline GN
    trajectory -- both are exact-by-construction restructurings, so the
    recovered pose must agree to f32 program-reassociation noise."""
    dec = fold_decoder_params(init_decoder_params(SPEC_D, jax.random.key(0)))
    enc = fold_encoder_params(init_encoder_params(SPEC_E, jax.random.key(1)))
    cfg = small_cfg(prune_min_vox_obs=4, ignore_count_th=1.0)
    pose0 = Isometry()
    rgb0, depth0, ok0 = render_surface_frame(pose0, CALIB, corrugation=0.1)
    true_delta = Isometry.from_twist(
        np.array([0.01, -0.008, 0.012, 0.004, -0.003, 0.005]))
    pose1 = pose0.dot(true_delta)
    rgb1, depth1, ok1 = render_surface_frame(pose1, CALIB, corrugation=0.1)

    def run(**kw):
        tcfg = T.TrackerConfig(point_budget=4096, **kw)
        tracker = T.SDFTracker(cfg, tcfg, dec, SPEC_D, CALIB)
        state = M.create_map_state(cfg)
        p0 = tracker.track_camera(state, rgb0, depth0, set_pose=pose0)
        w_pts, w_nrm, w_mask = tracker.last_pc_world(p0)
        state = M.integrate_keyframe(cfg, enc, state, w_pts, w_nrm, w_mask)
        tracker.track_camera(state, rgb1, depth1)
        return tracker.pose_at(-1)

    base = run()
    cached = run(sdf_gather_cache=True)
    unrolled = run(gn_unroll=2)
    both = run(sdf_gather_cache=True, gn_unroll=2)
    for other in (cached, unrolled, both):
        d = (base.inv().dot(other)).log()
        assert np.abs(d).max() < 1e-5, (np.abs(d).max(),)
    # perturb_points is mathematically neutral: at 2-frame scale the
    # f32 order sensitivity it exposes must stay tiny (the 240-frame
    # compounding is what the accuracy study measures)
    perturbed = run(perturb_points=7)
    d = (base.inv().dot(perturbed)).log()
    assert np.abs(d).max() < 1e-3, (np.abs(d).max(),)
