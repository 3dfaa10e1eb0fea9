"""SDF training-sample generation (TPU re-expression of the reference's
standalone CUDA sampler, pytorch/sampler_cuda/PreprocessMesh.cu).

The reference binary renders 100-300 ortho views with OpenGL into xyz+normal
FBOs and harvests visible pixels (ShaderProgram.cpp:5-125, Utils.cu:28-89);
here the same visibility logic is a **scatter-min z-buffer over candidate
surface samples** -- project area-weighted triangle samples into every
virtual camera and keep the ones that win (or nearly win) their pixel's depth
race.  The rest of the algorithm is a direct re-expression:

* area-CDF triangle sampling with two Gaussian perturbation scales
  (var, var/5; 47/50 near-surface ratio) plus uniform box samples in the
  1.2x-expanded bounding box (PreprocessMesh.cu:92-134, 32-50, 363-365),
* 11-vote SDF sign test against the visible-surface point cloud with NaN for
  ambiguous votes (ComputeSDFKernel, PreprocessMesh.cu:136-185); the kNN
  itself runs as chunked ||a-b||^2 matmuls on the MXU instead of a GPU
  kd-tree.

Heavy parts are jitted with static chunk shapes; orchestration is numpy
(this is offline tooling -- dynamic result sizes are fine on the host).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh_io import TriMesh


def equidist_points_on_sphere(samples: int) -> np.ndarray:
    """Fibonacci spiral (reference shapenet_model.py:44-58)."""
    i = np.arange(samples, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - (i / float(samples - 1)) * 2
    radius = np.sqrt(1 - y * y)
    theta = phi * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], axis=1)


def sample_on_triangles(mesh: TriMesh, n: int, rng: np.random.Generator
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Area-CDF triangle sampling (SamplePointKernel, PreprocessMesh.cu:92-134).
    Returns (points (n, 3), face_ids (n,))."""
    areas = mesh.face_areas()
    cdf = np.cumsum(areas)
    u = rng.random(n) * cdf[-1]
    tri = np.searchsorted(cdf, u).clip(0, len(areas) - 1)
    a = mesh.vertices[mesh.faces[tri, 0]]
    b = mesh.vertices[mesh.faces[tri, 1]]
    c = mesh.vertices[mesh.faces[tri, 2]]
    r1 = rng.random((n, 1))
    r2 = rng.random((n, 1))
    wa = 1.0 - np.sqrt(r1)
    wb = (1.0 - wa) * (1.0 - r2)
    wc = r2 * (1.0 - wa)
    return (wa * a + wb * b + wc * c).astype(np.float32), tri.astype(np.int32)


# ---------------------------------------------------------------------------
# Visibility (z-buffer over candidate samples)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("res",))
def _visible_pass(points: jnp.ndarray, cam_R: jnp.ndarray, cam_t: jnp.ndarray,
                  half_window: jnp.ndarray, res: int) -> jnp.ndarray:
    """One camera batch: ortho-project points into each camera's (res, res)
    pixel grid, scatter-min depth, and flag points within eps of their
    pixel's winner.  cam_R/cam_t: (C, 3, 3)/(C, 3) world->camera."""
    C = cam_R.shape[0]
    p_cam = jnp.einsum("cij,nj->cni", cam_R, points) + cam_t[:, None, :]
    u = (p_cam[..., 0] / half_window[:, None] * 0.5 + 0.5) * res
    v = (p_cam[..., 1] / half_window[:, None] * 0.5 + 0.5) * res
    z = p_cam[..., 2]
    ui = jnp.clip(u.astype(jnp.int32), 0, res - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, res - 1)
    inside = (u >= 0) & (u < res) & (v >= 0) & (v < res) & (z > 0)
    pix = vi * res + ui                                       # (C, N)
    zsafe = jnp.where(inside, z, jnp.inf)
    zbuf = jnp.full((C, res * res), jnp.inf, z.dtype)
    zbuf = zbuf.at[jnp.arange(C)[:, None], pix].min(zsafe)
    # candidates are POINT samples, not rasterized triangles: empty pixels
    # would let interior points win their own depth race.  A 3x3 min-pool
    # fills pixel-scale sampling gaps (the FBO render the reference harvests
    # has full triangle coverage, Utils.cu:28-89).
    zimg = zbuf.reshape(C, res, res)
    pooled = zimg
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            pooled = jnp.minimum(pooled, jnp.roll(zimg, (dv, du), axis=(1, 2)))
    winner = jnp.take_along_axis(pooled.reshape(C, res * res), pix, axis=1)
    eps = 1e-3 + 0.002 * jnp.abs(z)
    visible = inside & (z <= winner + eps)
    return jnp.any(visible, axis=0)


def visible_surface_samples(mesh: TriMesh, cameras: list, half_window: float,
                            n_candidates: int, rng: np.random.Generator,
                            res: int = 400, cam_batch: int = 25
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Surface points + face normals visible from at least one virtual camera
    (the reference's FBO harvesting, Utils.cu:28-89).  ``cameras`` is a list
    of camera-to-world Isometry poses looking at the object (ortho, window
    half-size ``half_window``)."""
    pts, tri = sample_on_triangles(mesh, n_candidates, rng)
    normals = mesh.face_normals()[tri]

    # look_at poses are +z-forward (motion.Isometry.look_at), so camera z is
    # depth directly -- no GL flip needed
    R = np.stack([c.inv().q.rotation_matrix for c in cameras]).astype(np.float32)
    t = np.stack([c.inv().t for c in cameras]).astype(np.float32)

    vis = np.zeros(n_candidates, bool)
    pj = jnp.asarray(pts)
    for s in range(0, len(cameras), cam_batch):
        e = min(s + cam_batch, len(cameras))
        hw = jnp.full((e - s,), half_window, jnp.float32)
        m = _visible_pass(pj, jnp.asarray(R[s:e]), jnp.asarray(t[s:e]), hw, res)
        vis |= np.asarray(m)
    return pts[vis], normals[vis]


# ---------------------------------------------------------------------------
# SDF via kNN voting (MXU distance matmuls)
# ---------------------------------------------------------------------------


# reference-axis tile for the kNN distance pass: the (Q, tile) distance
# slab is the kernel's live memory (8192 x 32768 x 4 B = 1 GiB), reused
# across tiles by the scan.  A single un-tiled pass materializes (Q, R)
# -- at R = 512k that is 16 GiB and an HBM OOM at compile time.
REF_TILE = 32768


@partial(jax.jit, static_argnames=("num_votes",))
def _sdf_chunk(q: jnp.ndarray, ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
               ref_norm2: jnp.ndarray, stdv: jnp.ndarray,
               max_ref_dist: jnp.ndarray, num_votes: int) -> jnp.ndarray:
    """SDF of one query chunk (Q, 3) against the reference surface cloud
    (ComputeSDFKernel semantics).  Distances via ||q||^2 + ||r||^2 - 2 q.r on
    the MXU; NaN marks ambiguous sign votes.

    The reference axis is processed in ``REF_TILE`` tiles under a
    ``lax.scan`` carrying the running top-k (k = num_votes): memory stays
    bounded at (Q, REF_TILE) for any cloud size.  Tie-breaking matches the
    single-pass ``top_k`` by construction -- within a tile ``top_k`` is
    stable (lowest index wins), and the merge concatenates the carry
    (earlier tiles, i.e. lower global indices) before the new tile's
    candidates, so equal distances still resolve to the lowest global
    index.  Caveat: that equivalence assumes the DISTANCES agree between
    the tiled and un-tiled programs; each is one 3-term dot, but XLA may
    in principle fuse/round the two shapes differently per backend, so the
    guarantee is per-backend determinism (equivalence-tested on the CPU
    backend, test_sampler.py), not a cross-program bit contract."""
    qn2 = jnp.sum(q * q, axis=1)[:, None]                     # (Q, 1)
    R = ref_xyz.shape[0]
    tile = min(REF_TILE, R)
    if R == tile:                                             # single pass
        d2 = qn2 + ref_norm2[None, :] - 2.0 * q @ ref_xyz.T   # (Q, R)
        neg_d2, idx = jax.lax.top_k(-d2, num_votes)           # (Q, K)
    else:
        assert R % tile == 0, (R, tile)   # compute_sdf pads to tile multiple

        def body(carry, s):
            bd2, bidx = carry
            rx = jax.lax.dynamic_slice(ref_xyz, (s, 0), (tile, 3))
            r2t = jax.lax.dynamic_slice(ref_norm2, (s,), (tile,))
            nd2 = -(qn2 + r2t[None, :] - 2.0 * q @ rx.T)      # (Q, tile)
            td2, tidx = jax.lax.top_k(nd2, num_votes)
            cd2 = jnp.concatenate([bd2, td2], axis=1)         # carry first:
            cidx = jnp.concatenate([bidx, tidx + s], axis=1)  # ties -> low idx
            md2, mpos = jax.lax.top_k(cd2, num_votes)
            midx = jnp.take_along_axis(cidx, mpos, axis=1)
            return (md2, midx), None

        init = (jnp.full((q.shape[0], num_votes), -jnp.inf, jnp.float32),
                jnp.zeros((q.shape[0], num_votes), jnp.int32))
        starts = jnp.arange(R // tile, dtype=jnp.int32) * tile
        (neg_d2, idx), _ = jax.lax.scan(body, init, starts)
    nb = ref_xyz[idx]                                         # (Q, K, 3)
    nn = ref_normal[idx]
    ray = q[:, None, :] - nb                                  # (Q, K, 3)
    ray_len = jnp.sqrt(jnp.maximum(jnp.sum(ray * ray, axis=-1), 1e-30))
    d = jnp.sum(nn * ray, axis=-1) / ray_len                  # (Q, K)
    num_pos = jnp.sum(d > 0, axis=-1)

    first_len = ray_len[:, 0]
    proj = jnp.abs(jnp.sum(nn[:, 0] * ray[:, 0], axis=-1))
    sdf_abs = jnp.where(first_len < stdv, proj, first_len)
    sdf = jnp.where(num_pos == 0, -sdf_abs,
                    jnp.where(num_pos == num_votes, sdf_abs, jnp.nan))
    sdf = jnp.where(first_len > max_ref_dist, jnp.nan, sdf)
    return sdf


def compute_sdf(queries: np.ndarray, ref_xyz: np.ndarray, ref_normal: np.ndarray,
                stdv: float, max_ref_dist: float = 1e8, num_votes: int = 11,
                chunk: int = 8192) -> np.ndarray:
    """11-vote signed distance of ``queries`` to the surface cloud.

    The reference cloud is padded to a power-of-two size (up to
    ``REF_TILE``, then to a power-of-two COUNT of ``REF_TILE`` tiles) so
    the jitted chunk kernel compiles once per SIZE BUCKET, not once per
    mesh: the visible-sample count varies mesh to mesh, and on the
    remote-compile TPU service a fresh trace costs minutes -- a per-mesh
    retrace turns corpus generation into hours.  Pad rows sit at 1e9 on
    each axis, so their squared distance (~3e18, exact in f32) can never
    enter the top-k of any real query and the votes are bit-identical to
    the unpadded program."""
    n = len(queries)
    n_pad = (n + chunk - 1) // chunk * chunk
    q = np.zeros((n_pad, 3), np.float32)
    q[:n] = queries
    r_real = len(ref_xyz)
    r_pad = max(1 << (r_real - 1).bit_length(), 1024)
    if r_pad > REF_TILE:   # pow2 number of REF_TILE-sized scan tiles
        n_tiles = -(-r_real // REF_TILE)
        r_pad = REF_TILE * (1 << (n_tiles - 1).bit_length())
    if r_pad != r_real:
        ref_xyz = np.concatenate(
            [ref_xyz, np.full((r_pad - r_real, 3), 1e9, np.float32)])
        ref_normal = np.concatenate(
            [ref_normal,
             np.tile(np.array([[1, 0, 0]], np.float32), (r_pad - r_real, 1))])
    rx = jnp.asarray(ref_xyz)
    rn = jnp.asarray(ref_normal)
    r2 = jnp.sum(rx * rx, axis=1)
    out = []
    for s in range(0, n_pad, chunk):
        out.append(np.asarray(_sdf_chunk(jnp.asarray(q[s:s + chunk]), rx, rn, r2,
                                         jnp.float32(stdv), jnp.float32(max_ref_dist),
                                         num_votes)))
    return np.concatenate(out)[:n]


# ---------------------------------------------------------------------------
# End-to-end per-mesh generation
# ---------------------------------------------------------------------------


class SamplerConfig(NamedTuple):
    """PreprocessMesh CLI surface (PreprocessMesh.cu:354-383 + the
    main_generator invocation, main_generator.py:37-45).

    ``reference_method`` selects the surface reference cloud like the
    binary's ``-r`` flag (PreprocessMesh.cu:377): 1 = camera-visibility
    filtered samples, 2 = raw mesh samples with face normals (no visibility),
    3 = an external (xyz, normal) cloud passed to
    :func:`generate_mesh_samples`."""
    reference_method: int = 1
    num_sample: int = 500000
    near_surface_ratio: float = 0.8            # -p (generator passes 0.8)
    variance: float = 0.005                    # --var
    bbox_expand: float = 1.2                   # -e
    num_votes: int = 11
    max_ref_dist: float = 1e8
    n_surface_candidates: int = 500000
    zbuffer_res: int = 400


def generate_mesh_samples(mesh: TriMesh, cameras: list, half_window: float,
                          cfg: SamplerConfig, rng: np.random.Generator,
                          reference_points: np.ndarray = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Full sampler pass for one mesh.  Returns (data (N, 4) xyz+sdf with
    ambiguous rows dropped, surface (M, 6) xyzn).  ``reference_points``
    ((M, 6) xyzn) is required for reference_method 3."""
    if cfg.reference_method == 1:
        surf_xyz, surf_normal = visible_surface_samples(
            mesh, cameras, half_window, cfg.n_surface_candidates, rng,
            res=cfg.zbuffer_res)
    elif cfg.reference_method == 2:
        surf_xyz, tri = sample_on_triangles(mesh, cfg.n_surface_candidates, rng)
        surf_normal = mesh.face_normals()[tri]
    elif cfg.reference_method == 3:
        assert reference_points is not None, "method 3 needs reference_points"
        surf_xyz = np.asarray(reference_points[:, :3], np.float32)
        surf_normal = np.asarray(reference_points[:, 3:6], np.float32)
    else:
        raise ValueError(f"unknown reference_method {cfg.reference_method}")
    if len(surf_xyz) < 100:
        return np.zeros((0, 4), np.float32), np.zeros((0, 6), np.float32)

    # query points: two perturbation scales around fresh surface samples
    # (half each, PreprocessMesh.cu:120-133) + uniform box samples
    n_near = int(cfg.num_sample * cfg.near_surface_ratio)
    n_half = n_near // 2
    n_uniform = cfg.num_sample - 2 * n_half
    base, _ = sample_on_triangles(mesh, n_half, rng)
    q1 = base + rng.standard_normal((n_half, 3)).astype(np.float32) * np.sqrt(cfg.variance)
    q2 = base + rng.standard_normal((n_half, 3)).astype(np.float32) * np.sqrt(cfg.variance / 5.0)
    lo, hi = mesh.bounds()
    center, half = (lo + hi) / 2, (hi - lo) / 2 * cfg.bbox_expand
    qu = (center + (rng.random((n_uniform, 3)) * 2 - 1) * half).astype(np.float32)
    queries = np.concatenate([q1, q2, qu])

    sdf = compute_sdf(queries, surf_xyz, surf_normal,
                      stdv=np.sqrt(cfg.variance), max_ref_dist=cfg.max_ref_dist,
                      num_votes=cfg.num_votes)
    keep = ~np.isnan(sdf)
    data = np.concatenate([queries[keep], sdf[keep, None]], axis=1)
    surface = np.concatenate([surf_xyz, surf_normal], axis=1)
    return data.astype(np.float32), surface.astype(np.float32)
