"""Chunked scan dispatch (slam.track_fuse_scan) equivalence: K frames run as
one lax.scan must produce the same poses and map state as K per-frame calls
(the per-frame path is the reference-parity baseline, main.py refresh loop)."""
import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from difusion_tpu.core import hash_map as HM
from difusion_tpu.core import map as M
from difusion_tpu.core import tracker as tracker_mod
from difusion_tpu.core.tracker import TrackerConfig
from difusion_tpu.data import SyntheticSequence
from difusion_tpu.models.decoder import fold_decoder_params
from difusion_tpu.models.encoder import fold_encoder_params
from difusion_tpu.ops.imgproc import Intrinsic
from difusion_tpu.slam import SLAMSystem

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not conftest.reference_ckpt_available(),
                                 reason="reference checkpoint unavailable")]

CALIB = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)


@pytest.fixture(scope="module")
def prior():
    from difusion_tpu.models import torch_import as TI
    dec_t, enc_t, spec_d, _, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))
    return dec, enc, spec_d


def _system(prior, map_cfg=None, **kw):
    dec, enc, spec = prior
    if map_cfg is None:
        map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                              voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                              prune_min_vox_obs=4, ignore_count_th=1.0,
                              encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=4096,
                         motion_prior=kw.pop("motion_prior", "none"))
    defaults = dict(integrate_interval=3, depth_cut=(0.5, 5.0), meshing=False)
    defaults.update(kw)
    return SLAMSystem(map_cfg, tcfg, dec, enc, spec, CALIB, **defaults)


def _frames(n=7):
    seq = SyntheticSequence(n_frames=n, h=120, w=160, calib=CALIB,
                            corrugation=0.1, motion_scale=0.6)
    return [next(seq) for _ in range(n)]


def _run_pair(prior, frames, map_cfg=None, motion_prior="none"):
    """(per-frame system, chunked system) over the same frames."""
    kw = dict(map_cfg=map_cfg, motion_prior=motion_prior)
    ref = _system(prior, **kw)
    for f in frames:
        ref.process_frame(f)

    chunked = _system(prior, **kw)
    chunked.process_frame(frames[0])
    h, w = frames[0].depth.shape
    packed = jnp.stack([jnp.asarray(tracker_mod.pack_frame(
        f.rgb, f.depth, CALIB.dcam_scale)) for f in frames[1:]])
    chunked.process_chunk(packed, h, w)
    return ref, chunked


def test_scan_matches_per_frame_poses_and_map(prior):
    """Tolerances: the scan body and the standalone per-frame program are
    the same computation but XLA fuses them differently, and the GN
    energy-reject/early-exit branches amplify ulp-level reduction-order
    differences into ~1e-4 pose deltas (bounded -- they do not grow with
    frame count).  0.3 mm over 7 frames is equivalence for this purpose."""
    frames = _frames(7)
    ref, chunked = _run_pair(prior, frames)

    assert chunked.tracker.n_tracked == ref.tracker.n_tracked == 7
    for pr, pc in zip(ref.tracker.all_pd_pose, chunked.tracker.all_pd_pose):
        np.testing.assert_allclose(pc.matrix, pr.matrix, atol=3e-4)
    # pose deltas can move boundary points across voxel borders: a tiny
    # fraction of slots may fuse slightly different point sets
    la = np.asarray(chunked.state.latents)
    lb = np.asarray(ref.state.latents)
    frac_off = (np.abs(la - lb) > 1e-3).mean()
    assert frac_off < 0.005, frac_off
    ca = np.asarray(chunked.state.obs_count)
    cb = np.asarray(ref.state.obs_count)
    assert (ca != cb).mean() < 0.01, (ca != cb).mean()


def test_scan_split_chunks_match_single_chunk(prior):
    """Two chunks of 3 == one chunk of 6 (carry round-trips correctly)."""
    frames = _frames(7)
    one = _system(prior)
    one.process_frame(frames[0])
    h, w = frames[0].depth.shape
    pk = [jnp.asarray(tracker_mod.pack_frame(f.rgb, f.depth, CALIB.dcam_scale))
          for f in frames[1:]]
    one.process_chunk(jnp.stack(pk), h, w)

    two = _system(prior)
    two.process_frame(frames[0])
    two.process_chunk(jnp.stack(pk[:3]), h, w)
    two.process_chunk(jnp.stack(pk[3:]), h, w)

    for pa, pb in zip(one.tracker.all_pd_pose, two.tracker.all_pd_pose):
        np.testing.assert_allclose(pb.matrix, pa.matrix, atol=1e-6)
    np.testing.assert_allclose(np.asarray(two.state.latents),
                               np.asarray(one.state.latents), atol=1e-6)


def test_scan_constant_velocity_prior(prior):
    frames = _frames(6)
    ref, chunked = _run_pair(prior, frames, motion_prior="constant_velocity")
    for pr, pc in zip(ref.tracker.all_pd_pose, chunked.tracker.all_pd_pose):
        np.testing.assert_allclose(pc.matrix, pr.matrix, atol=1e-5)


def test_run_sequence_chunked_matches_per_frame(prior):
    """run_sequence(chunk=3) (feeder batches + ragged tail) == per-frame."""
    def make_seq():
        return SyntheticSequence(n_frames=8, h=120, w=160, calib=CALIB,
                                 corrugation=0.1, motion_scale=0.6)

    ref = _system(prior)
    r_ref = ref.run_sequence(make_seq())
    chunked = _system(prior)
    r_chk = chunked.run_sequence(make_seq(), chunk=3)   # 1 + 3 + 3 + 1 tail

    assert r_chk["n_frames"] == r_ref["n_frames"] == 8
    # tolerance rationale: see test_scan_matches_per_frame_poses_and_map
    for pr, pc in zip(r_ref["trajectory"], r_chk["trajectory"]):
        np.testing.assert_allclose(pc.matrix, pr.matrix, atol=3e-4)
    np.testing.assert_allclose(r_chk["ate_rmse"], r_ref["ate_rmse"], atol=1e-4)


def test_chunk_refreshes_last_processed(prior):
    """After process_chunk, tracker.last_processed must hold the CHUNK's
    final frame: a later per-frame step landing on an integrate frame fuses
    via last_pc_world, and a stale pre-chunk cloud would corrupt the map
    (round-2 advisor finding).  Also: gt-pose mode must refuse the chunked
    path."""
    frames = _frames(7)
    ref, chunked = _run_pair(prior, frames)
    # tolerance rationale: see test_scan_matches_per_frame_poses_and_map
    np.testing.assert_allclose(
        np.asarray(chunked.tracker.last_processed.pts_cam),
        np.asarray(ref.tracker.last_processed.pts_cam), atol=1e-4)
    mask_a = np.asarray(chunked.tracker.last_processed.pc_mask)
    mask_b = np.asarray(ref.tracker.last_processed.pc_mask)
    assert (mask_a != mask_b).mean() < 0.01

    # mixing chunk -> per-frame must now match pure per-frame end to end
    extra = SyntheticSequence(n_frames=10, h=120, w=160, calib=CALIB,
                              corrugation=0.1, motion_scale=0.6)
    more = [next(extra) for _ in range(10)][7:]
    for f in more:
        ref.process_frame(f)
        chunked.process_frame(f)
    la = np.asarray(chunked.state.latents)
    lb = np.asarray(ref.state.latents)
    frac_off = (np.abs(la - lb) > 1e-3).mean()
    assert frac_off < 0.005, frac_off

    chunked.use_gt_poses = True
    h, w = frames[0].depth.shape
    pk = jnp.stack([jnp.asarray(tracker_mod.pack_frame(
        f.rgb, f.depth, CALIB.dcam_scale)) for f in frames[1:3]])
    with pytest.raises(AssertionError):
        chunked.process_chunk(pk, h, w)


def test_scan_latent_optimize_matches_per_frame(prior):
    """latent_optimize composes with the chunked dispatch (round-3 verdict
    missing #1; reference map.py:29-113,498-513 -- optimization concurrent
    with tracking).  With one integrate per chunk the schedule is
    step-for-step identical to the per-frame interleaved path: optimize
    launches after the integrate keyframe, the pending result merges inside
    the NEXT chunk's scan at its integrate frame.  Poses and latents must
    match within the scan tolerance."""
    frames = _frames(7)
    map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=20.0)   # low: voxels converge fast
    kw = dict(map_cfg=map_cfg, latent_optimize=True, optim_n_iters=5)
    ref = _system(prior, **kw)
    for f in frames:
        ref.process_frame(f)

    chunked = _system(prior, **kw)
    chunked.process_frame(frames[0])
    h, w = frames[0].depth.shape
    pk = [jnp.asarray(tracker_mod.pack_frame(f.rgb, f.depth, CALIB.dcam_scale))
          for f in frames[1:]]
    chunked.process_chunk(jnp.stack(pk[:3]), h, w)   # integrate at frame 3
    chunked.process_chunk(jnp.stack(pk[3:]), h, w)   # integrate at frame 6

    # the optimizer must have actually touched latents, else this is vacuous
    assert int(np.asarray(ref.state.optimized).sum()) > 0
    assert int(np.asarray(chunked.state.optimized).sum()) > 0
    for pr, pc in zip(ref.tracker.all_pd_pose, chunked.tracker.all_pd_pose):
        np.testing.assert_allclose(pc.matrix, pr.matrix, atol=3e-4)
    la = np.asarray(chunked.state.latents)
    lb = np.asarray(ref.state.latents)
    frac_off = (np.abs(la - lb) > 1e-3).mean()
    assert frac_off < 0.005, frac_off
    np.testing.assert_array_equal(np.asarray(chunked.state.optimized),
                                  np.asarray(ref.state.optimized))

    # both paths carry a pending (not yet merged) result from frame 6
    assert (ref._pending_opt is None) == (chunked._pending_opt is None)


def test_run_sequence_chunked_latent_optimize(prior):
    """run_sequence(chunk=...) no longer falls back to per-frame when
    latent_optimize is on; the run completes and optimizes voxels."""
    map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=20.0)
    seq = SyntheticSequence(n_frames=8, h=120, w=160, calib=CALIB,
                            corrugation=0.1, motion_scale=0.6)
    sysm = _system(prior, map_cfg=map_cfg, latent_optimize=True,
                   optim_n_iters=5)
    r = sysm.run_sequence(seq, chunk=3)
    assert r["n_frames"] == 8
    assert int(np.asarray(sysm.state.optimized).sum()) > 0
    assert r["opt_overflow"] == 0


def test_gt_pose_mapping_only(prior):
    """use_gt_poses (BASELINE eval config 2): fusion under the GT trajectory,
    no tracking -- trajectory equals GT exactly, map still fills."""
    frames = _frames(6)
    sysm = _system(prior)
    sysm.use_gt_poses = True
    for f in frames:
        sysm.process_frame(f)
    assert sysm.tracker.n_tracked == 6
    for p, f in zip(sysm.tracker.all_pd_pose, frames):
        np.testing.assert_allclose(p.matrix, f.gt_pose.matrix, atol=1e-6)
    assert int(sysm.state.n_occupied) > 50


def test_scan_hash_backend(prior):
    dec, enc, spec = prior
    map_cfg = HM.HashMapConfig(voxel_size=0.1, latent_dim=29,
                               capacity=1 << 12, table_size=1 << 14,
                               prune_min_vox_obs=4, ignore_count_th=1.0,
                               encoder_count_th=600.0)
    frames = _frames(5)
    ref, chunked = _run_pair(prior, frames, map_cfg=map_cfg)
    for pr, pc in zip(ref.tracker.all_pd_pose, chunked.tracker.all_pd_pose):
        np.testing.assert_allclose(pc.matrix, pr.matrix, atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.state.latents),
                               np.asarray(ref.state.latents), atol=1e-5)
