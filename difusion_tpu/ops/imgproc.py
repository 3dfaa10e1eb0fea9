"""Depth/intensity image processing ops (TPU re-expression of the reference
CUDA imgproc extension, pytorch/system/ext/imgproc/{imgproc.cu,photometric.cu}).

Every op is a static-shape ``jnp`` map over the image grid -- the CUDA
per-pixel kernels are embarrassingly parallel stencils, which XLA fuses into a
handful of HBM passes on TPU; no Pallas needed at these arithmetic
intensities.  Invalidity is carried as explicit boolean masks instead of the
reference's NaN sentinels (NaN-free math keeps XLA free to use fast paths),
with thin NaN-compatible wrappers where the reference API is mirrored.

Semantics parity notes are cited per-function.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Intrinsic(NamedTuple):
    """Pinhole intrinsics (reference FrameIntrinsic,
    dataset/production/__init__.py:4-17)."""
    fx: float
    fy: float
    cx: float
    cy: float
    dcam_scale: float = 1000.0

    def to_K(self) -> np.ndarray:
        return np.array([[self.fx, 0.0, self.cx],
                         [0.0, self.fy, self.cy],
                         [0.0, 0.0, 1.0]])

    def scaled(self, s: float) -> "Intrinsic":
        return Intrinsic(self.fx * s, self.fy * s, self.cx * s, self.cy * s,
                         self.dcam_scale)


# ---------------------------------------------------------------------------
# Unprojection & depth filtering
# ---------------------------------------------------------------------------


def unproject_depth(depth: jnp.ndarray, valid: jnp.ndarray,
                    fx: float, fy: float, cx: float, cy: float
                    ) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) camera-space point map (imgproc.cu:5-23).
    Invalid pixels produce zeros; carry ``valid`` alongside."""
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    d = jnp.where(valid, depth, 0.0)
    return jnp.stack([(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1)


_MEAN_SIGMA_L = 1.2232


def filter_depth(depth: jnp.ndarray, valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """5x5 depth-adaptive bilateral filter (imgproc.cu:49-94): spatial weight
    exp(-.5 (|i|+|j|) sigma_L^2), range weight exp(-.5 dz^2 sigma_z^2) with the
    sensor-noise model sigma_z(z).  Border (2 px) and invalid pixels pass
    through unchanged."""
    z = jnp.where(valid, depth, 0.0)
    sigma_z = 1.0 / (0.0012 + 0.0019 * (z - 0.4) ** 2 + 0.0001 / jnp.sqrt(jnp.maximum(z, 1e-12)) * 0.25)

    w_sum = jnp.zeros_like(z)
    d_sum = jnp.zeros_like(z)
    for i in range(-2, 3):
        for j in range(-2, 3):
            nn_z = jnp.roll(z, (-i, -j), axis=(0, 1))
            nn_ok = jnp.roll(valid, (-i, -j), axis=(0, 1))
            dz2 = (nn_z - z) ** 2
            w = jnp.exp(-0.5 * ((abs(i) + abs(j)) * _MEAN_SIGMA_L ** 2 + dz2 * sigma_z ** 2))
            w = jnp.where(nn_ok, w, 0.0)
            w_sum += w
            d_sum += w * nn_z
    out = d_sum / jnp.maximum(w_sum, 1e-12)

    h, w = depth.shape
    u = jnp.arange(w)[None, :]
    v = jnp.arange(h)[:, None]
    interior = (v >= 2) & (v < h - 2) & (u >= 2) & (u < w - 2)
    ok = valid & interior & (w_sum > 0)
    return jnp.where(ok, out, depth), valid


# ---------------------------------------------------------------------------
# Normals
# ---------------------------------------------------------------------------


def _sensor_weight(z: jnp.ndarray, normal_z: jnp.ndarray) -> jnp.ndarray:
    """Sensor-noise weight model (imgproc.cu:133-135): 1/w where w grows with
    depth and grazing angle theta = acos(n_z)."""
    theta = jnp.arccos(jnp.clip(normal_z, -1.0, 1.0))
    theta_diff = theta / (0.5 * 3.14159 - theta)
    w = (0.0012 + 0.0019 * (z - 0.4) ** 2
         + 0.0001 / jnp.sqrt(jnp.maximum(z, 1e-12)) * theta_diff ** 2)
    return 1.0 / w


def compute_normal_weight(pc_map: jnp.ndarray, valid: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Central-difference cross-product normals + sensor weight
    (imgproc.cu:98-137).  Returns (normal (H,W,3), weight (H,W), ok (H,W))."""
    h, w, _ = pc_map.shape

    def shift(a, dv, du):
        return jnp.roll(a, (-dv, -du), axis=(0, 1))

    xp1 = shift(pc_map, 0, 1)
    xm1 = shift(pc_map, 0, -1)
    yp1 = shift(pc_map, 1, 0)
    ym1 = shift(pc_map, -1, 0)
    nb_ok = (shift(valid, 0, 1) & shift(valid, 0, -1)
             & shift(valid, 1, 0) & shift(valid, -1, 0))

    diff_x = xp1 - xm1
    diff_y = yp1 - ym1
    normal = jnp.cross(diff_y, diff_x)
    norm = jnp.linalg.norm(normal, axis=-1)
    normal = normal / jnp.maximum(norm, 1e-12)[..., None]

    u = jnp.arange(w)[None, :]
    v = jnp.arange(h)[:, None]
    interior = (v >= 1) & (v < h - 1) & (u >= 1) & (u < w - 1)
    ok = valid & nb_ok & interior & (norm >= 1e-6) & (pc_map[..., 2] > 1e-6)
    weight = _sensor_weight(pc_map[..., 2], normal[..., 2])
    return normal, jnp.where(ok, weight, -1.0), ok


def sym3eig_smallest_components(x11, x12, x13, x22, x23, x33):
    """Closed-form smallest eigenpair from the 6 unique components of batched
    symmetric 3x3 matrices (imgproc.cu:164-243 / pcproc.cu:22-98).  Component
    layout keeps every array at the batch shape -- no trailing tiny dims to
    tile-pad on TPU.  Returns (vx, vy, vz, lam)."""
    p1 = x12 ** 2 + x13 ** 2 + x23 ** 2
    q = (x11 + x22 + x33) / 3.0
    p2 = (x11 - q) ** 2 + (x22 - q) ** 2 + (x33 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 1e-30) / 6.0)
    ip = 1.0 / p
    b11, b12, b13 = ip * (x11 - q), ip * x12, ip * x13
    b22, b23, b33 = ip * (x22 - q), ip * x23, ip * (x33 - q)
    r = (b11 * b22 * b33 + 2.0 * b12 * b23 * b13
         - b13 * b22 * b13 - b12 * b12 * b33 - b11 * b23 * b23) / 2.0
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)

    # rows of (A - lam I)
    a1 = (x11 - lam, x12, x13)
    a2 = (x12, x22 - lam, x23)
    a3 = (x13, x23, x33 - lam)

    def cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    r12, r13, r23 = cross(a1, a2), cross(a1, a3), cross(a2, a3)
    d1 = r12[0] ** 2 + r12[1] ** 2 + r12[2] ** 2
    d2 = r13[0] ** 2 + r13[1] ** 2 + r13[2] ** 2
    d3 = r23[0] ** 2 + r23[1] ** 2 + r23[2] ** 2
    use13 = d2 >= jnp.maximum(d1, d3)
    use23 = (d3 > jnp.maximum(d1, d2)) & ~use13
    d_best = jnp.where(use13, d2, jnp.where(use23, d3, d1))
    inv = 1.0 / jnp.sqrt(jnp.maximum(d_best, 1e-30))
    comps = []
    for c in range(3):
        v = jnp.where(use13, r13[c], jnp.where(use23, r23[c], r12[c]))
        comps.append(v * inv)
    return comps[0], comps[1], comps[2], lam


def sym3eig_smallest(cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form smallest eigenpair of batched symmetric 3x3 matrices
    (array-of-matrices wrapper over :func:`sym3eig_smallest_components`).
    cov: (..., 3, 3) -> (eigvec (..., 3), eigval (...,))."""
    vx, vy, vz, lam = sym3eig_smallest_components(
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2])
    return jnp.stack([vx, vy, vz], axis=-1), lam


def compute_normal_weight_robust(pc_map: jnp.ndarray, valid: jnp.ndarray,
                                 radius: int = 3, dist2_th: float = 0.01,
                                 min_count: float = 9.0
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Windowed-PCA normals (imgproc.cu:246-331): mean/covariance over a
    (2*radius+1)^2 window restricted to points within sqrt(dist2_th) of the
    center, closed-form smallest eigenvector, flip towards the camera."""
    h, w, _ = pc_map.shape
    z_ok = valid & (pc_map[..., 2] > 1e-6)
    p = jnp.where(z_ok[..., None], pc_map, 0.0)

    # scan over window offsets (compiles one roll, not (2r+1)^2 of them)
    window = jnp.asarray([(dv, du) for dv in range(-radius, radius + 1)
                          for du in range(-radius, radius + 1)], jnp.int32)

    def neighbor(off):
        pos = jnp.roll(p, (-off[0], -off[1]), axis=(0, 1))
        ok = jnp.roll(z_ok, (-off[0], -off[1]), axis=(0, 1))
        near = ok & (jnp.sum((pos - pc_map) ** 2, axis=-1) < dist2_th)
        return pos, near.astype(p.dtype)

    def mean_body(carry, off):
        s, cnt = carry
        pos, wgt = neighbor(off)
        return (s + pos * wgt[..., None], cnt + wgt), None

    (s, cnt), _ = jax.lax.scan(mean_body, (jnp.zeros_like(p),
                                           jnp.zeros(p.shape[:2], p.dtype)), window)
    mean = s / jnp.maximum(cnt, 1.0)[..., None]

    def cov_body(cov, off):
        pos, wgt = neighbor(off)
        d = (pos - mean) * wgt[..., None]
        return cov + d[..., :, None] * (pos - mean)[..., None, :], None

    cov, _ = jax.lax.scan(cov_body, jnp.zeros(p.shape[:2] + (3, 3), p.dtype), window)

    normal, _ = sym3eig_smallest(cov)
    flip = jnp.sum(normal * pc_map, axis=-1) > 0.0
    normal = jnp.where(flip[..., None], -normal, normal)

    u = jnp.arange(w)[None, :]
    v = jnp.arange(h)[:, None]
    interior = (v >= radius) & (v < h - radius) & (u >= radius) & (u < w - radius)
    ok = z_ok & interior & (cnt >= min_count)
    weight = _sensor_weight(pc_map[..., 2], normal[..., 2])
    return normal, jnp.where(ok, weight, -1.0), ok


# ---------------------------------------------------------------------------
# Intensity gradients & photometric odometry
# ---------------------------------------------------------------------------


def gradient_xy(intensity: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients /8 with invalid 1-px border (photometric.cu:3-22).
    Returns (grad (H,W,2) [d/du, d/dv], ok (H,W))."""
    h, w = intensity.shape

    def sh(dv, du):
        return jnp.roll(intensity, (-dv, -du), axis=(0, 1))

    gx = ((sh(-1, 1) - sh(-1, -1)) + 2.0 * (sh(0, 1) - sh(0, -1)) + (sh(1, 1) - sh(1, -1))) / 8.0
    gy = ((sh(1, -1) - sh(-1, -1)) + 2.0 * (sh(1, 0) - sh(-1, 0)) + (sh(1, 1) - sh(-1, 1))) / 8.0
    u = jnp.arange(w)[None, :]
    v = jnp.arange(h)[:, None]
    ok = (v >= 1) & (v < h - 1) & (u >= 1) & (u < w - 1)
    grad = jnp.stack([jnp.where(ok, gx, 0.0), jnp.where(ok, gy, 0.0)], axis=-1)
    return grad, ok


def warp_texture(prev_intensity: jnp.ndarray,
                 prev_depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 8) packed warp texture for :func:`rgb_odometry`: the 4 bilinear
    intensity taps and 4 depth neighbors of every pixel, so the warp needs
    ONE gather per target pixel.  Rolls wrap at the border, but a wrapped
    tap always carries interpolation weight exactly 0 (lookup coords are
    clipped to w-1, so au = 0 whenever ui+1 would wrap; same for v), and the
    wrapped depth tap is never the nearest for the same reason."""
    i_r = jnp.roll(prev_intensity, -1, axis=1)
    i_d = jnp.roll(prev_intensity, -1, axis=0)
    d_r = jnp.roll(prev_depth, -1, axis=1)
    d_d = jnp.roll(prev_depth, -1, axis=0)
    return jnp.stack([prev_intensity, i_r, i_d, jnp.roll(i_d, -1, axis=1),
                      prev_depth, d_r, d_d, jnp.roll(d_d, -1, axis=1)],
                     axis=-1)                                     # (H, W, 8)


def _space_to_depth_filter(window: int, stride: int,
                           n_ch: int) -> np.ndarray:
    """One-hot conv filter (window, window, n_ch, window*window*n_ch*?) that
    extracts, at every output position, the full window x window x n_ch
    patch as channels: out ch ``(r*window + c)*n_ch + ch`` = input pixel
    ``(stride*a + r, stride*b + c)`` channel ``ch``.  Space-to-depth as ONE
    MXU convolution -- the layout-transpose formulations of the same
    reshuffle cost ~15 ms at 480x640 on TPU (minor-dim-2 relayouts pad to
    the (8, 128) tile); the conv costs ~0.1 ms."""
    k = window * window * n_ch
    filt = np.zeros((window, window, n_ch, k), np.float32)
    for r in range(window):
        for c in range(window):
            for ch in range(n_ch):
                filt[r, c, ch, (r * window + c) * n_ch + ch] = 1.0
    return filt


def _patches(img: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """(H/stride, W/stride, window*window*C) strided patch extraction of an
    (H, W, C) image via the one-hot conv (zero padding past the border).
    Exact: each output element is a 1.0*x + 0*... accumulation, and with
    precision HIGH (bf16x3 passes) the three bf16 components of x are each
    multiplied by an exact 1.0 and re-summed in f32 -- bit-exact f32
    selection at half the MXU passes of HIGHEST (measured on the profile:
    the one-hot convs are MXU-pass-bound, not bandwidth-bound)."""
    h, w, n_ch = img.shape
    filt = jnp.asarray(_space_to_depth_filter(window, stride, n_ch))
    out = jax.lax.conv_general_dilated(
        img[None], filt, (stride, stride),
        padding=((0, window - stride), (0, window - stride)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGH)
    return out[0]


def warp_texture_tiled(prev_intensity: jnp.ndarray,
                       prev_depth: jnp.ndarray) -> jnp.ndarray:
    """(H/2 * W/2, 50) block-tiled warp texture: row ``a * W/2 + b`` is the
    5x5x2 image patch with top-left corner at pixel ``(2a, 2b)`` -- channel
    ``(r*5+c)*2 + ch`` is image channel ``ch`` (0=intensity, 1=depth) at
    pixel ``(2a+r, 2b+c)`` (zeros past the border).

    Rationale: TPU gathers cost ~flat per ROW, nearly nothing per byte, and
    the per-iteration warp gather is the roofline's top line item at rgb
    stride 1 (5.7 of the 11.3 ms frame).  One row of this texture covers
    the bilinear footprints of a whole 2x2 block of target pixels for any
    EVEN window start (:func:`rgb_odometry_tiled` rounds the start down to
    even; the 5-wide window still leaves slack for a floor-coordinate
    spread of 2-3 across the block), so the warp needs ONE gather row per
    block -- 4x fewer rows than the per-pixel 8-channel
    :func:`warp_texture`.  Built as one one-hot 5x5 stride-2 convolution
    (space-to-depth on the MXU, ~0.4 ms at 480x640; the transpose/reshape
    formulation of the same layout costs ~15 ms -- minor dims of 2 pad to
    the (8, 128) tile).  Border zeros are only ever read with
    interpolation weight exactly 0 (lookup coords are clipped)."""
    h, w = prev_intensity.shape
    assert h % 2 == 0 and w % 2 == 0, "tiled warp texture needs even dims"
    img2 = jnp.stack([prev_intensity, prev_depth], axis=-1)        # (h, w, 2)
    pat = _patches(img2, window=5, stride=2)            # (H2, W2, 50)
    # flatten to gather-operand shape HERE, once per frame: leaving it to the
    # consumer re-lays the 15 MB texture out every GN iteration (profiled
    # ~42 us x iterations/frame)
    return pat.reshape((h // 2) * (w // 2), 50)         # (H2*W2, 50)


def warp_texture_tiled_quantized(prev_intensity: jnp.ndarray,
                                 prev_depth: jnp.ndarray,
                                 dcam_scale: float) -> jnp.ndarray:
    """(H/2 * W/2, 75) bfloat16 block-tiled warp texture for SENSOR-GRID
    frames: channel ``r*5+c`` is round(255 * intensity), ``25 + r*5+c`` the
    high byte and ``50 + r*5+c`` the low byte of round(dcam_scale * depth),
    at pixel ``(2a+r, 2b+c)``.

    Bit-exact-by-construction fast path for the quantized packed pipeline
    (the shipped default): when intensity sits on the uint8 grid and depth
    on the uint16 sensor grid, all three planes are integers in [0, 255] --
    EXACTLY representable in bfloat16 -- so the one-hot space-to-depth conv
    runs as ONE bf16 MXU pass instead of the f32 texture's three
    (:func:`_patches` at precision HIGH), and the texture itself is half
    the bytes.  :func:`rgb_odometry_tiled` reconstructs
    ``u8 -> f32 * (1/255)`` and ``(hi*256 + lo) -> f32 * (1/dcam_scale)``
    per tap -- the identical arithmetic the unpacker applies to the full
    image, so every warped value matches the f32 texture bit-for-bit.  For
    off-grid inputs (``lossless_packing``, direct-API float frames) use
    :func:`warp_texture_tiled`; this path would quantize them."""
    h, w = prev_intensity.shape
    assert h % 2 == 0 and w % 2 == 0, "tiled warp texture needs even dims"
    i255 = jnp.round(prev_intensity * 255.0)
    d_units = jnp.round(prev_depth * dcam_scale)        # exact u16 integers
    d_hi = jnp.floor(d_units * (1.0 / 256.0))
    d_lo = d_units - 256.0 * d_hi
    img3 = jnp.stack([i255, d_hi, d_lo], axis=-1).astype(jnp.bfloat16)
    fl = _space_to_depth_filter(5, 2, 3)
    # channel order [25 x int | 25 x hi | 25 x lo]: tap (r, c) of plane p is
    # output channel p*25 + r*5 + c (contiguous per-plane blocks, so the
    # consumer's tap reads are plain adds on the channel index)
    fl = fl.reshape(5, 5, 3, 25, 3).transpose(0, 1, 2, 4, 3).reshape(5, 5, 3, 75)
    out = jax.lax.conv_general_dilated(
        img3[None], jnp.asarray(fl, jnp.bfloat16), (2, 2),
        padding=((0, 3), (0, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]  # (H2, W2, 75) bf16
    return out.reshape((h // 2) * (w // 2), 75)


class TiledFramePlanes(NamedTuple):
    """Parity-plane split of one pyramid level's current-frame inputs for
    :func:`rgb_odometry_tiled`: plane ``P = p*2 + q`` of array ``X`` holds
    ``X[p::2, q::2]`` -- i.e. entry ``[P, a, b]`` is pixel
    ``(2a+p, 2b+q)``.  All arrays are (4, H/2, W/2); masks ride as f32
    0/1 through the split conv and are re-thresholded."""
    intensity: jnp.ndarray
    depth: jnp.ndarray
    depth_ok: jnp.ndarray
    grad_x: jnp.ndarray
    grad_y: jnp.ndarray
    grad_ok: jnp.ndarray


def make_tiled_frame_planes(intensity: jnp.ndarray, depth: jnp.ndarray,
                            depth_ok: jnp.ndarray, grad: jnp.ndarray,
                            grad_ok: jnp.ndarray) -> TiledFramePlanes:
    """Split a level's current-frame inputs into 2x2 parity planes with four
    1x1-window stride-2 ``reduce_window`` calls over the channel-major
    stack.  Plane ``P = p*2 + q`` selects ``X[p::2, q::2]`` via the window
    padding ``(-p, p-1)`` (negative low padding skips the first row/column;
    window 1 + add + init 0 is an exact identity read).  Profiled vs the
    one-hot-conv formulation: the conv costs ~0.27 ms + a ~0.24 ms input
    relayout at 480x640, the four pooling reads ~0.05 ms total, because the
    channel-major output (4, 6, H2, W2) is already the layout every
    downstream consumer wants (no NHWC->planes transpose).  Computed once
    per frame -- everything downstream of it in the GN iteration is
    elementwise over (4, H/2, W/2) grids."""
    h, w = intensity.shape
    assert h % 2 == 0 and w % 2 == 0
    f32 = intensity.dtype
    stacked = jnp.stack([intensity, depth, depth_ok.astype(f32),
                         grad[..., 0], grad[..., 1],
                         grad_ok.astype(f32)], axis=0)             # (6, h, w)
    pl = jnp.stack([
        jax.lax.reduce_window(stacked, 0.0, jax.lax.add, (1, 1, 1), (1, 2, 2),
                              [(0, 0), (-p, p - 1), (-q, q - 1)])
        for p in (0, 1) for q in (0, 1)])                # (4, 6, H2, W2)
    return TiledFramePlanes(intensity=pl[:, 0], depth=pl[:, 1],
                            depth_ok=pl[:, 2] > 0.5,
                            grad_x=pl[:, 3], grad_y=pl[:, 4],
                            grad_ok=pl[:, 5] > 0.5)


def rgb_odometry_tiled(planes: TiledFramePlanes, tex: jnp.ndarray,
                       intr: jnp.ndarray, krkinv: jnp.ndarray,
                       kt: jnp.ndarray,
                       min_grad_scale: float, max_depth_delta: float,
                       dcam_scale: float = 0.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Block-tiled :func:`rgb_odometry` (stride 1, bilinear): the previous
    frame is sampled through the (H2*W2, 50) f32 :func:`warp_texture_tiled`
    texture -- or the (H2*W2, 75) bf16
    :func:`warp_texture_tiled_quantized` one (``dcam_scale`` required then;
    taps reconstruct by the unpacker's exact arithmetic) -- with ONE gather
    row per 2x2 pixel block.  Shapes differ from ``rgb_odometry`` -- inputs
    are the parity planes of :func:`make_tiled_frame_planes`, outputs are
    ``f (4, H2, W2)``, ``J (6, 4, H2, W2)``, ``ok (4, H2, W2)`` in the same
    plane order (a pure re-indexing of the pixel set; the tracker's
    normal-equation sums are order-free).

    Per kept pixel the residual and Jacobian are BIT-EXACT vs
    ``rgb_odometry(..., bilinear=True, coord_stride=1)``; a pixel is
    additionally dropped (``ok`` False) when its 2x2 block's four bilinear
    footprints do not fit a common even-aligned 5x5 window -- blocks
    straddling strong depth discontinuities, where the ``max_depth_delta``
    gate already culls aggressively."""
    _, H2, W2 = planes.intensity.shape
    h, w = 2 * H2, 2 * W2
    dt = planes.depth.dtype

    # full-res pixel coords of each plane entry: (2a + p, 2b + q)
    p_ = jnp.asarray([0, 0, 1, 1], dt)[:, None, None]
    q_ = jnp.asarray([0, 1, 0, 1], dt)[:, None, None]
    u = 2.0 * jnp.arange(W2, dtype=dt)[None, None, :] + q_         # (4,H2,W2)
    v = 2.0 * jnp.arange(H2, dtype=dt)[None, :, None] + p_

    m2 = planes.grad_x ** 2 + planes.grad_y ** 2
    ok = planes.grad_ok & (m2 >= min_grad_scale) & planes.depth_ok

    d1 = jnp.where(planes.depth_ok, planes.depth, 0.0)
    wz = d1 * (krkinv[2, 0] * u + krkinv[2, 1] * v + krkinv[2, 2]) + kt[2]
    wz_safe = jnp.where(jnp.abs(wz) > 1e-12, wz, 1.0)
    u0f = (d1 * (krkinv[0, 0] * u + krkinv[0, 1] * v + krkinv[0, 2]) + kt[0]) / wz_safe
    v0f = (d1 * (krkinv[1, 0] * u + krkinv[1, 1] * v + krkinv[1, 2]) + kt[1]) / wz_safe
    u0 = jnp.round(u0f).astype(jnp.int32)
    v0 = jnp.round(v0f).astype(jnp.int32)
    inside = (u0 >= 0) & (u0 < w) & (v0 >= 0) & (v0 < h)
    u0c = jnp.clip(u0, 0, w - 1)
    v0c = jnp.clip(v0, 0, h - 1)

    u0a = jnp.clip(u0f, 0.0, w - 1.0)
    v0a = jnp.clip(v0f, 0.0, h - 1.0)
    uf = jnp.floor(u0a)
    vf = jnp.floor(v0a)
    au = u0a - uf
    av = v0a - vf
    ui = uf.astype(jnp.int32)
    vi = vf.astype(jnp.int32)

    # shared window base per block: masked min of the 4 floor coords,
    # rounded DOWN to even so the base addresses a texture row directly
    # (the 5-wide window still covers a floor spread of 2-3)
    cand = ok & inside
    big = jnp.int32(1) << 20
    s_u = jnp.clip(jnp.min(jnp.where(cand, ui, big), axis=0), 0, w - 2) & ~1
    s_v = jnp.clip(jnp.min(jnp.where(cand, vi, big), axis=0), 0, h - 2) & ~1

    quantized = tex.shape[-1] == 75
    assert not quantized or dcam_scale > 0.0, \
        "the quantized (75-ch) texture needs dcam_scale for tap reconstruction"
    row = (s_v >> 1) * W2 + (s_u >> 1)                             # (H2, W2)
    tile = jnp.take(tex, row.reshape(-1), axis=0).reshape(H2, W2, -1)

    ru = ui - s_u[None]
    rv = vi - s_v[None]
    fits = cand & (ru <= 3) & (rv <= 3)            # ru/rv >= 0 for cand
    ru = jnp.clip(ru, 0, 3)
    rv = jnp.clip(rv, 0, 3)

    # unrolled 5x5 window accumulation.  Row/col weights are exactly
    # (1-a) at the floor tap, a at floor+1 and literal 0.0 elsewhere, so
    # the sums reproduce rgb_odometry's ((1-au)*t0 + au*t1) bit-for-bit
    # (x + 0.0 == x); border zeros in the texture only meet weight 0.
    su = au >= 0.5
    sv = av >= 0.5
    iu = ru + su
    iv = rv + sv

    # tap accessors for the two texture layouts.  Quantized taps rebuild the
    # f32 values with the EXACT arithmetic preprocess_frame_packed applies
    # to the full image (u8 * (1/255); (lo + 256*hi) * (1/dcam_scale)), so
    # warped values match the f32 texture bit-for-bit on sensor-grid frames.
    if quantized:
        inv_d = 1.0 / dcam_scale
        def tap_i(r, c):
            return tile[..., r * 5 + c].astype(dt) * (1.0 / 255.0)
        def tap_d(r, c):
            return (tile[..., 50 + r * 5 + c].astype(dt)
                    + 256.0 * tile[..., 25 + r * 5 + c].astype(dt)) * inv_d
    else:
        def tap_i(r, c):
            return tile[..., (r * 5 + c) * 2]
        def tap_d(r, c):
            return tile[..., (r * 5 + c) * 2 + 1]

    prev_val = jnp.zeros_like(au)
    d0 = jnp.zeros_like(d1)
    for r in range(5):
        wv_r = jnp.where(rv == r, 1.0 - av, jnp.where(rv + 1 == r, av, 0.0))
        inner = jnp.zeros_like(au)
        for c in range(5):
            wu_c = jnp.where(ru == c, 1.0 - au,
                             jnp.where(ru + 1 == c, au, 0.0))
            inner = inner + wu_c * tap_i(r, c)
        prev_val = prev_val + wv_r * inner
        for c in range(5):
            d0 = d0 + jnp.where((iv == r) & (iu == c), tap_d(r, c), 0.0)

    ok = (ok & inside & fits & (jnp.abs(wz - d0) <= max_depth_delta)
          & (d0 > 0.0))
    f = jnp.where(ok, planes.intensity - prev_val, 0.0)

    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    gz = jnp.where(d0 > 1e-12, d0, 1.0)
    gx = d0 * (u0c.astype(dt) - cx) / fx
    gy = d0 * (v0c.astype(dt) - cy) / fy
    p0 = planes.grad_x * fx / gz
    p1 = planes.grad_y * fy / gz
    p2 = -(p0 * gx + p1 * gy) / gz
    J = jnp.stack([p0, p1, p2,
                   -gz * p1 + gy * p2,
                   gz * p0 - gx * p2,
                   -gy * p0 + gx * p1], axis=0)    # (6, 4, H2, W2)
    J = jnp.where(ok[None], -J, 0.0)   # tracker-side negation folded in
    return f, J, ok


def rgb_odometry(prev_intensity: jnp.ndarray, prev_depth: jnp.ndarray,
                 prev_depth_ok: jnp.ndarray,
                 cur_intensity: jnp.ndarray, cur_depth: jnp.ndarray,
                 cur_depth_ok: jnp.ndarray,
                 cur_dIdxy: jnp.ndarray, grad_ok: jnp.ndarray,
                 intr: jnp.ndarray, krkinv: jnp.ndarray, kt: jnp.ndarray,
                 min_grad_scale: float, max_depth_delta: float,
                 bilinear: bool = True, coord_stride: int = 1,
                 prev_tex: jnp.ndarray = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel photometric residual + analytic 6-DoF Jacobian
    (photometric.cu:24-77).  Warps the *current* pixel into the previous frame
    with ``K R K^-1`` / ``K t``.

    Returns (f (H,W), J (H,W,6), ok (H,W)).  ``intr`` = [fx, fy, cx, cy];
    the emitted J is for ``+xi`` on the current pose (the CUDA kernel computes
    the ``-xi`` gradient which the tracker negates, tracker.py:157 -- here the
    negation is folded in).

    ``bilinear=True`` samples the previous intensity bilinearly instead of the
    reference's round-to-nearest (photometric.cu:53-55): sub-pixel smoothness
    removes the quantization plateaus that stall Gauss-Newton near the optimum
    (depth gating and Jacobian geometry stay nearest-neighbor like the
    reference).  Pass ``bilinear=False`` for exact reference semantics.

    ``coord_stride``: the *current*-frame inputs are a stride-s subsample of
    the full image (pixel (i, j) sits at full-res coords (i*s, j*s)); the
    previous frame stays full-res for lookups.  Random gathers are the TPU
    bottleneck of this op, and a strided residual subset is an unbiased
    subsample of the normal equations.

    ``prev_tex``: optionally the precomputed :func:`warp_texture` of the
    previous frame.  The texture is iteration-invariant, but XLA does not
    hoist its construction (6 rolls + a 10 MB stack at 480x640) out of the
    GN ``while_loop`` -- callers that iterate should build it once per
    frame and pass it in.

    See :func:`rgb_odometry_tiled` for the block-tiled variant that cuts
    the gather rows 4x (the op's TPU bottleneck) at stride 1.
    """
    h, w = prev_intensity.shape        # lookup/bounds resolution
    hc, wc = cur_intensity.shape
    u = (jnp.arange(wc, dtype=cur_depth.dtype) * coord_stride)[None, :]
    v = (jnp.arange(hc, dtype=cur_depth.dtype) * coord_stride)[:, None]

    dI_dx = cur_dIdxy[..., 0]
    dI_dy = cur_dIdxy[..., 1]
    m2 = dI_dx ** 2 + dI_dy ** 2
    ok = grad_ok & (m2 >= min_grad_scale) & cur_depth_ok

    d1 = jnp.where(cur_depth_ok, cur_depth, 0.0)
    wz = d1 * (krkinv[2, 0] * u + krkinv[2, 1] * v + krkinv[2, 2]) + kt[2]
    wz_safe = jnp.where(jnp.abs(wz) > 1e-12, wz, 1.0)
    u0f = (d1 * (krkinv[0, 0] * u + krkinv[0, 1] * v + krkinv[0, 2]) + kt[0]) / wz_safe
    v0f = (d1 * (krkinv[1, 0] * u + krkinv[1, 1] * v + krkinv[1, 2]) + kt[1]) / wz_safe
    u0 = jnp.round(u0f).astype(jnp.int32)
    v0 = jnp.round(v0f).astype(jnp.int32)
    inside = (u0 >= 0) & (u0 < w) & (v0 >= 0) & (v0 < h)
    u0c = jnp.clip(u0, 0, w - 1)
    v0c = jnp.clip(v0, 0, h - 1)

    if bilinear:
        u0a = jnp.clip(u0f, 0.0, w - 1.0)
        v0a = jnp.clip(v0f, 0.0, h - 1.0)
        uf = jnp.floor(u0a)
        vf = jnp.floor(v0a)
        au = u0a - uf
        av = v0a - vf
        ui = uf.astype(jnp.int32)
        vi = vf.astype(jnp.int32)
        # intensity's 4 bilinear taps AND depth's 4 neighbors ride ONE gather
        # of a packed 8-channel texture (profiled: the warp's random gathers
        # are the bulk of an L0 GN iteration on TPU; 2 gathers -> 1).  The
        # nearest-pixel depth (reference round(), photometric.cu:53-55) is
        # recovered by selecting the tap on the au/av >= 0.5 side.
        tex = prev_tex if prev_tex is not None \
            else warp_texture(prev_intensity, prev_depth)
        taps = tex[vi, ui]                                        # (hc, wc, 8)
        prev_val = ((1 - av) * ((1 - au) * taps[..., 0] + au * taps[..., 1])
                    + av * ((1 - au) * taps[..., 2] + au * taps[..., 3]))
        su = au >= 0.5
        sv = av >= 0.5
        d0 = jnp.where(sv, jnp.where(su, taps[..., 7], taps[..., 6]),
                       jnp.where(su, taps[..., 5], taps[..., 4]))
    else:
        # round-to-nearest intensity + depth (exact reference semantics,
        # photometric.cu:53-55); prev_tex here is the plain 2-channel
        # [intensity, depth] stack (iteration-invariant, caller-hoisted)
        tex = prev_tex if prev_tex is not None \
            else jnp.stack([prev_intensity, prev_depth], axis=-1)
        tap = tex[v0c, u0c]
        prev_val = tap[..., 0]
        d0 = tap[..., 1]
    if prev_depth_ok is None:
        # caller zeroed invalid depths (preprocess does) -> d0 > 0 covers
        # validity and one gather per pixel disappears
        d0_ok = True
    else:
        d0_ok = prev_depth_ok[v0c, u0c]
    ok = ok & inside & d0_ok & (jnp.abs(wz - d0) <= max_depth_delta) & (d0 > 0.0)
    f = cur_intensity - prev_val
    f = jnp.where(ok, f, 0.0)

    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    gz = jnp.where(d0 > 1e-12, d0, 1.0)
    gx = d0 * (u0c.astype(d1.dtype) - cx) / fx
    gy = d0 * (v0c.astype(d1.dtype) - cy) / fy
    p0 = dI_dx * fx / gz
    p1 = dI_dy * fy / gz
    p2 = -(p0 * gx + p1 * gy) / gz
    J = jnp.stack([p0, p1, p2,
                   -gz * p1 + gy * p2,
                   gz * p0 - gx * p2,
                   -gy * p0 + gx * p1], axis=-1)
    J = jnp.where(ok[..., None], -J, 0.0)   # tracker-side negation folded in
    return f, J, ok


# ---------------------------------------------------------------------------
# Image pyramid (torch-interpolate-compatible /2 resizes)
# ---------------------------------------------------------------------------


def half_bilinear(img: jnp.ndarray) -> jnp.ndarray:
    """Factor-2 bilinear downsample, torch ``interpolate(..., 'bilinear')``
    semantics (align_corners=False): exactly 2x2 average pooling for even
    input sizes (tracker.py:48-52).  Expressed as a pooling primitive: the
    (h/2, 2, w/2, 2) reshape is a (8, 128)-tile relayout on TPU (~0.1
    ms/frame profiled); the strided window is a fused strided read."""
    h, w = img.shape
    img = img[:h - h % 2, :w - w % 2]
    return jax.lax.reduce_window(img, 0.0, jax.lax.add, (2, 2), (2, 2),
                                 "VALID") * 0.25


def subsample2d(img: jnp.ndarray, s: int) -> jnp.ndarray:
    """``img[::s, ::s]`` (torch nearest-downsample semantics, src =
    floor(s*dst)) over the leading two dims, expressed as a 1x1-window
    stride-s ``reduce_window``: a strided slice lowers to a per-row gather
    on TPU (~1.1 ms on 480x640 f32), the pooling primitive to a strided
    copy (~0.4 ms measured)."""
    if s == 1:
        return img
    window = (1, 1) + (1,) * (img.ndim - 2)
    strides = (s, s) + (1,) * (img.ndim - 2)
    if img.dtype == jnp.bool_:
        return jax.lax.reduce_window(img, False, jax.lax.bitwise_or,
                                     window, strides, "VALID")
    return jax.lax.reduce_window(img, -jnp.inf if jnp.issubdtype(img.dtype, jnp.floating)
                                 else jnp.iinfo(img.dtype).min,
                                 jax.lax.max, window, strides, "VALID")


def half_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Factor-2 nearest downsample, torch semantics: src = floor(2*dst)."""
    return subsample2d(img, 2)


def masked_half_bilinear(img: jnp.ndarray, ok: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear /2 where invalid pixels are excluded from the average (the
    reference feeds NaN depth through bilinear and lives with NaN poisoning of
    intensity never happening because intensity has no NaNs; we keep intensity
    dense and track depth validity explicitly)."""
    h, w = img.shape
    i4 = jnp.where(ok, img, 0.0)[:h - h % 2, :w - w % 2].reshape(h // 2, 2, w // 2, 2)
    o4 = ok[:h - h % 2, :w - w % 2].reshape(h // 2, 2, w // 2, 2)
    cnt = o4.sum(axis=(1, 3))
    return i4.sum(axis=(1, 3)) / jnp.maximum(cnt, 1), cnt > 0


class Pyramid(NamedTuple):
    """3-level intensity/depth/gradient pyramid (tracker.py:41-56)."""
    intensity: Tuple[jnp.ndarray, ...]
    depth: Tuple[jnp.ndarray, ...]
    depth_ok: Tuple[jnp.ndarray, ...]
    grad: Tuple[jnp.ndarray, ...]
    grad_ok: Tuple[jnp.ndarray, ...]


def make_image_pyramid(intensity: jnp.ndarray, depth: jnp.ndarray,
                       depth_ok: jnp.ndarray, levels: int = 3) -> Pyramid:
    ints, deps, oks, grads, goks = [intensity], [depth], [depth_ok], [], []
    for _ in range(levels - 1):
        ints.append(half_bilinear(ints[-1]))
        deps.append(half_nearest(deps[-1]))
        oks.append(half_nearest(oks[-1]))
    for lvl in range(levels):
        g, gok = gradient_xy(ints[lvl])
        grads.append(g)
        goks.append(gok)
    return Pyramid(tuple(ints), tuple(deps), tuple(oks), tuple(grads), tuple(goks))
