"""End-to-end SLAM pipeline test: track+fuse+mesh a synthetic RGB-D sequence
with the shipped reference prior and verify trajectory accuracy and mesh
output (reference flow: pytorch/main.py refresh loop)."""
import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from difusion_tpu.core import map as M
from difusion_tpu.core.tracker import TrackerConfig
from difusion_tpu.data import SyntheticSequence
from difusion_tpu.models.decoder import fold_decoder_params
from difusion_tpu.models.encoder import fold_encoder_params
from difusion_tpu.ops.imgproc import Intrinsic
from difusion_tpu.slam import SLAMSystem

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not conftest.reference_ckpt_available(),
                                 reason="reference checkpoint unavailable")]


@pytest.fixture(scope="module")
def prior():
    from difusion_tpu.models import torch_import as TI
    dec_t, enc_t, spec_d, _, _ = TI.load_torch_prior(conftest.REFERENCE_CKPT, 300)
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))
    return dec, enc, spec_d


def _system(prior, tcfg=None, **kw):
    dec, enc, spec = prior
    map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=600.0)
    tcfg = tcfg or TrackerConfig(point_budget=8192)
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    defaults = dict(integrate_interval=4, depth_cut=(0.5, 5.0),
                    mesh_resolution=2, max_triangles=1 << 18)
    defaults.update(kw)
    return SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib, **defaults)


def test_slam_synthetic_sequence(prior, tmp_path):
    seq = SyntheticSequence(n_frames=9, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    system = _system(prior)
    result = system.run_sequence(seq)

    assert result["n_frames"] == 9
    assert result["n_voxels"] > 50
    assert result["ate_rmse"] < 0.012, result   # ~1 cm on noise-free input

    tris, stds = system.mesher.triangles()
    assert len(tris) > 100
    # quantitative mesh accuracy against the analytic surface (slope-
    # normalized point distance): mean must be well under the 0.1 m relief
    # amplitude -- 2 cm, not the old 0.08 m near-vacuous bound
    from difusion_tpu.data.production import mesh_error_stats
    err = mesh_error_stats(tris)
    assert err["mesh_err_mean"] < 0.02, err
    assert err["mesh_err_p95"] < 0.06, err

    system.save_trajectory(str(tmp_path / "traj.txt"))
    data = np.genfromtxt(tmp_path / "traj.txt")
    assert data.shape == (9, 8)
    system.mesher.write_ply(str(tmp_path / "mesh.ply"))
    assert (tmp_path / "mesh.ply").stat().st_size > 1000

    system.save_map(str(tmp_path / "map.npz"))
    cfg2, state2 = M.load_map(str(tmp_path / "map.npz"))
    assert int(state2.n_occupied) == result["n_voxels"]


def test_slam_blocked_gram_tracks_like_default(prior):
    """solve_dtype='blocked' (layout-native MXU partial Grams + compensated
    cross-block combine) is the same math as the plain f32 path at f32
    resolution: the full pipeline must track within noise of the default on
    a clean synthetic sequence, exercising both the tiled-warp RGB per-row
    partial path and the SDF blocked gram."""
    def seq():
        return SyntheticSequence(n_frames=9, h=120, w=160,
                                 calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                                 corrugation=0.1, motion_scale=0.6)
    system = _system(prior)
    base = system.run_sequence(seq())
    sysb = _system(prior, tcfg=TrackerConfig(point_budget=8192,
                                             solve_dtype="blocked"))
    blk = sysb.run_sequence(seq())
    assert blk["ate_rmse"] < 0.012, blk
    assert abs(blk["ate_rmse"] - base["ate_rmse"]) < 0.004, (base, blk)


def test_slam_mapping_only_gt_poses(prior):
    """Mapping-only config (BASELINE config 2): GT poses, fusion+meshing."""
    seq = SyntheticSequence(n_frames=8, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    system = _system(prior, integrate_interval=2)
    for i, frame in enumerate(seq):
        rgb, depth = jnp.asarray(frame.rgb), jnp.asarray(frame.depth)
        pose = system.tracker.track_camera(system.state, rgb, depth,
                                           set_pose=frame.gt_pose)
        if i % 2 == 0:
            w_pts, w_nrm, w_mask = system.tracker.last_pc_world(pose)
            system.state = M.integrate_keyframe(system.map_cfg, system.enc_params,
                                                system.state, w_pts, w_nrm, w_mask)
    system.state = system.mesher.extract(system.state, max_std=0.3)
    tris, _ = system.mesher.triangles()
    assert len(tris) > 100


def test_slam_hash_map_backend(prior):
    """BASELINE config-4 capability: same SLAM flow on the hash-indexed map
    (unbounded scene, no precomputed bounds)."""
    from difusion_tpu.core import hash_map as H
    dec, enc, spec = prior
    map_cfg = H.HashMapConfig(voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                              table_size=1 << 16, prune_min_vox_obs=4,
                              ignore_count_th=1.0, encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=8192)
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                        integrate_interval=4, depth_cut=(0.5, 5.0),
                        mesh_resolution=2, max_triangles=1 << 18)
    seq = SyntheticSequence(n_frames=9, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    result = system.run_sequence(seq)
    assert result["n_voxels"] > 50
    assert result["ate_rmse"] < 0.012, result
    tris, _ = system.mesher.triangles()
    assert len(tris) > 100
    from difusion_tpu.data.production import mesh_error_stats
    err = mesh_error_stats(tris)
    assert err["mesh_err_mean"] < 0.02, err


@pytest.mark.parametrize("mode", ["sync", "interleaved"])
def test_slam_with_latent_optimization(prior, mode):
    """Latent-optimize branch (reference map.py step 3 + OptimizeProcess):
    converged voxels get Adam-refined latents without breaking tracking."""
    seq = SyntheticSequence(n_frames=7, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    dec, enc, spec = prior
    map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=50.0)   # low so voxels converge fast
    tcfg = TrackerConfig(point_budget=8192)
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                        integrate_interval=2, depth_cut=(0.5, 5.0),
                        meshing=False, latent_optimize=True,
                        latent_optimize_mode=mode, optim_n_iters=5)
    result = system.run_sequence(seq)
    assert result["ate_rmse"] < 0.02, result
    assert bool(np.asarray(system.state.optimized).any())


def test_slam_noisy_depth(prior):
    """Sensor-like depth noise + dropouts: outlier removal and robust kernels
    must keep tracking stable (BASELINE config-4 noise characteristics)."""
    rng = np.random.default_rng(11)

    class NoisySeq(SyntheticSequence):
        def render(self, pose):
            rgb, depth, ok = super().render(pose)
            noise = rng.normal(0, 0.004 * depth ** 2).astype(np.float32)
            salt = rng.random(depth.shape) < 0.02          # 2% dropouts
            depth = np.where(salt, 0.0, depth + noise).astype(np.float32)
            return rgb, depth, ok & ~salt

    seq = NoisySeq(n_frames=9, h=120, w=160,
                   calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                   corrugation=0.1, motion_scale=0.6)
    system = _system(prior)
    result = system.run_sequence(seq)
    assert result["n_voxels"] > 50
    # noise floor ~4mm at 2m; tracking should stay within a few cm
    assert result["ate_rmse"] < 0.03, result


def test_slam_async_meshing(prior):
    """run_async parity: meshing in a worker thread over snapshot state
    produces the same kind of mesh and never corrupts the map."""
    seq = SyntheticSequence(n_frames=9, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    system = _system(prior, run_async=True)
    result = system.run_sequence(seq)
    assert result["ate_rmse"] < 0.012
    tris, _ = system.mesher.triangles()
    assert len(tris) > 100
    from difusion_tpu.data.production import mesh_error_stats
    err = mesh_error_stats(tris)
    assert err["mesh_err_mean"] < 0.02, err


def test_full_icl_format_pipeline(prior, tmp_path):
    """The complete production path: ICL-NUIM-format dataset on disk (native
    PNG decode, uint16 depth, TUM gt with the axis-flip convention),
    reference-format config -> SLAMSystem.from_config -> ATE."""
    import subprocess
    import sys as _sys
    cv2 = pytest.importorskip("cv2")
    _sys.path.insert(0, "tools")
    from make_synthetic_icl import main as make_icl
    first_tq = [float(v) for v in make_icl(str(tmp_path / "icl"), n_frames=5)]

    from difusion_tpu.config import dict_to_args
    from difusion_tpu.data import ICLNUIMSequence
    seq = ICLNUIMSequence(str(tmp_path / "icl"), first_tq=first_tq, load_gt=True)
    assert seq.calib.fx == 481.2
    # written gt parses back to the rendered trajectory exactly
    for i, g in enumerate(seq.gt_trajectory):
        import numpy as _np
        d = _np.abs((g.inv().dot(
            __import__("difusion_tpu.data", fromlist=["SyntheticSequence"])
            .SyntheticSequence(n_frames=5, h=480, w=640, calib=seq.calib,
                               corrugation=0.1, motion_scale=0.5)
            .gt_trajectory[i])).log()).max()
        assert d < 1e-6, (i, d)

    args = dict_to_args(dict(
        sequence_type="icl_nuim.ICLNUIMSequence",
        sequence_kwargs=dict(path=str(tmp_path / "icl"), first_tq=first_tq,
                             load_gt=True),
        training_hypers=conftest.REFERENCE_CKPT, using_epoch=300,
        resolution=2, depth_cut_min=0.5, depth_cut_max=5.0,
        integrate_interval=4, run_async=False,
        mapping=dict(bound_min=[-3.5, -3.5, -0.5], bound_max=[3.5, 3.5, 3.5],
                     voxel_size=0.1, prune_min_vox_obs=16,
                     ignore_count_th=16.0, encoder_count_th=600.0),
        tracking=dict(
            iter_config=[{"n": 10, "type": [["rgb", 2]]},
                         {"n": 10, "type": [["sdf"], ["rgb", 1]]},
                         {"n": 50, "type": [["sdf"], ["rgb", 0]]}],
            sdf=dict(robust_kernel="huber", robust_k=5.0, subsample=0.5),
            rgb=dict(weight=500.0, robust_kernel=None, robust_k=0.01,
                     min_grad_scale=0.0, max_depth_delta=0.2)),
    ))
    system = SLAMSystem.from_config(args, seq.calib, seq.first_iso,
                                    meshing=False)
    result = system.run_sequence(seq)
    assert result["ate_rmse"] < 0.01, result


def test_constant_velocity_prior_survives_fast_motion(prior):
    """Constant-velocity GN seeding tracks accurately under fast motion."""
    def run(motion_prior):
        seq = SyntheticSequence(n_frames=8, h=120, w=160,
                                calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                                corrugation=0.1, motion_scale=3.5)
        dec, enc, spec = prior
        map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                              voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                              prune_min_vox_obs=4, ignore_count_th=1.0,
                              encoder_count_th=600.0)
        tcfg = TrackerConfig(point_budget=8192, motion_prior=motion_prior)
        calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
        system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                            integrate_interval=4, depth_cut=(0.5, 5.0),
                            meshing=False)
        return system.run_sequence(seq)["ate_rmse"]

    # at 3.5x motion both initializations still converge (the pyramid is
    # robust); this pins the constant-velocity code path and its accuracy
    ate_cv = run("constant_velocity")
    assert ate_cv < 0.02, ate_cv


def test_full_scannet_format_pipeline(prior, tmp_path):
    """Config-4 path: ScanNet-format dataset (jpg color, mm depth, per-frame
    pose files) on the hash-indexed map through from_config."""
    pytest.importorskip("cv2")
    import sys as _sys
    _sys.path.insert(0, "tools")
    from make_synthetic_scannet import main as make_scannet
    make_scannet(str(tmp_path / "scan"), n_frames=4)

    from difusion_tpu.config import dict_to_args
    from difusion_tpu.data import ScanNetSequence
    seq = ScanNetSequence(str(tmp_path / "scan"))
    args = dict_to_args(dict(
        sequence_type="x", sequence_kwargs={},
        training_hypers=conftest.REFERENCE_CKPT, using_epoch=300,
        resolution=2, depth_cut_min=0.5, depth_cut_max=5.0,
        integrate_interval=2, run_async=False,
        mapping=dict(indexer="hash", voxel_size=0.1, prune_min_vox_obs=16,
                     ignore_count_th=16.0, encoder_count_th=600.0),
        tracking=dict(
            iter_config=[{"n": 10, "type": [["rgb", 2]]},
                         {"n": 10, "type": [["sdf"], ["rgb", 1]]},
                         {"n": 50, "type": [["sdf"], ["rgb", 0]]}],
            sdf=dict(robust_kernel="huber", robust_k=5.0, subsample=0.5),
            rgb=dict(weight=500.0, robust_kernel=None, robust_k=0.01,
                     min_grad_scale=0.0, max_depth_delta=0.2)),
    ))
    system = SLAMSystem.from_config(args, seq.calib, seq.first_iso,
                                    meshing=False)
    assert system.is_hash
    result = system.run_sequence(seq)
    assert result["ate_rmse"] < 0.01, result


def test_map_save_load_resume_tracking(prior, tmp_path):
    """Reference README workflow: save the map, reload it in a fresh system,
    and keep tracking against the loaded map (relocalization-style resume)."""
    dec, enc, spec = prior
    seq = SyntheticSequence(n_frames=9, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    frames = [next(seq) for _ in range(9)]

    system = _system(prior, meshing=False)
    system.first_iso = seq.first_iso
    for f in frames[:6]:
        system.process_frame(f)
    system.save_map(str(tmp_path / "m.npz"))

    cfg2, state2 = M.load_map(str(tmp_path / "m.npz"))
    system2 = _system(prior, meshing=False)
    assert cfg2 == system2.map_cfg
    system2.state = state2
    # resume: re-anchor at the frame-6 gt pose, then track 7 and 8 against
    # the RELOADED map only
    system2.first_iso = frames[6].gt_pose
    for f in frames[6:]:
        system2.process_frame(f)
    p8 = system2.tracker.pose_at(-1)
    err = (p8.inv().dot(frames[8].gt_pose)).log()
    assert np.linalg.norm(err[:3]) < 0.02, err


@pytest.mark.slow
def test_slam_loop_trajectory_revisit(prior):
    """Loop trajectory: the final quarter of the circuit re-enters territory
    mapped at the start, so tracking runs against an OLD map -- the failure
    mode forward drift never exercises (VERDICT round 2, item 1).  Longer
    horizon than the other e2e tests (48 frames)."""
    seq = SyntheticSequence(n_frames=48, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.4,
                            trajectory="loop")
    dec, enc, spec = prior
    map_cfg = M.MapConfig(bound_min=(-2.0, -1.2, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=8192,
                         motion_prior="constant_velocity")
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                        integrate_interval=4, depth_cut=(0.5, 5.0),
                        mesh_resolution=2, max_triangles=1 << 18)
    result = system.run_sequence(seq)
    assert result["n_frames"] == 48
    # odometric drift at 120x160 is ~2-3 mm/frame; over 48 frames the bound
    # guards against DIVERGENCE on revisit, not absolute accuracy (the
    # 480p/300-frame loop numbers live in tools/accuracy_study.py).
    # Measured: revisit frames 44-47 REDUCE the error (4.6 -> 3.7 cm) --
    # tracking against the old map corrects rather than compounds.
    assert result["ate_rmse"] < 0.035, result
    # closure: the last pose lines up with GT while tracked against the map
    # built 40 frames earlier
    err = (system.tracker.pose_at(-1).inv().dot(
        seq.gt_trajectory[47])).log()
    assert np.linalg.norm(err[:3]) < 0.06, err
    from difusion_tpu.data.production import mesh_error_stats
    merr = mesh_error_stats(system.mesher.triangles()[0])
    assert merr["mesh_err_mean"] < 0.025, merr


def test_capacity_exhaustion_is_surfaced(prior):
    """When allocation overflows the slot capacity, run_sequence's result
    reports it (alloc_overflow/opt_overflow counters) instead of silently
    dropping coverage (VERDICT round 2, item 8)."""
    dec, enc, spec = prior
    map_cfg = M.MapConfig(bound_min=(-2.0, -2.0, -0.5), n_xyz=(40, 40, 40),
                          voxel_size=0.1, latent_dim=29, capacity=64,
                          prune_min_vox_obs=4, ignore_count_th=1.0,
                          encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=8192)
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                        integrate_interval=2, depth_cut=(0.5, 5.0),
                        meshing=False)
    seq = SyntheticSequence(n_frames=5, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    result = system.run_sequence(seq)
    assert "alloc_overflow" in result and "opt_overflow" in result
    # a 64-slot map cannot hold the scene: overflow must be visible
    assert result["alloc_overflow"] > 0
    assert result["n_voxels"] == 64


def test_slam_hash_with_latent_optimization(prior):
    """Latent optimization over the hash backend through the pipeline."""
    from difusion_tpu.core import hash_map as H
    dec, enc, spec = prior
    map_cfg = H.HashMapConfig(voxel_size=0.1, latent_dim=29, capacity=1 << 14,
                              table_size=1 << 16, prune_min_vox_obs=4,
                              ignore_count_th=1.0, encoder_count_th=50.0)
    tcfg = TrackerConfig(point_budget=8192)
    calib = Intrinsic(fx=300.0, fy=300.0, cx=79.5, cy=59.5)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, calib,
                        integrate_interval=2, depth_cut=(0.5, 5.0),
                        meshing=False, latent_optimize=True,
                        latent_optimize_mode="interleaved", optim_n_iters=5)
    seq = SyntheticSequence(n_frames=7, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    result = system.run_sequence(seq)
    assert result["ate_rmse"] < 0.02, result
    assert bool(np.asarray(system.state.optimized).any())


def test_interactive_driver_scripted_stdin(prior, tmp_path, monkeypatch):
    """The --interactive terminal loop (slam.py run_interactive; the
    reference GUI's ','/'.'-key callbacks, main.py:136-148) driven by a
    scripted command sequence: step, info, mesh, render, free-run, quit."""
    seq = SyntheticSequence(n_frames=8, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    system = _system(prior)
    cmds = iter(["i",          # info before any frame ("no frames tracked")
                 "s",          # step frame 0
                 "",           # empty = step frame 1
                 "m",          # mesh now
                 "v",          # render a view PNG
                 "i",          # info with a pose
                 "r 3",        # free-run 3 frames (-> 5 tracked)
                 "bogus",      # unknown op falls through to step (-> 6)
                 "q"])         # quit early
    monkeypatch.setattr("builtins.input", lambda _="": next(cmds))
    result = system.run_interactive(seq, out_dir=str(tmp_path))

    assert result["n_frames"] == 6          # q stopped before frame 7
    assert result["n_voxels"] > 50
    assert "ate_rmse" in result and result["ate_rmse"] < 0.02, result
    pngs = list(tmp_path.glob("view_*.png"))
    assert len(pngs) == 1 and pngs[0].stat().st_size > 1000
    tris, _ = system.mesher.triangles()
    assert len(tris) > 100


def test_interactive_driver_eof_free_runs(prior, monkeypatch):
    """EOF on stdin (piped/closed input) free-runs to the end instead of
    crashing -- the CLI stays usable under `... < /dev/null`."""
    seq = SyntheticSequence(n_frames=5, h=120, w=160,
                            calib=Intrinsic(300.0, 300.0, 79.5, 59.5),
                            corrugation=0.1, motion_scale=0.6)
    system = _system(prior, meshing=False)

    def raise_eof(_=""):
        raise EOFError
    monkeypatch.setattr("builtins.input", raise_eof)
    result = system.run_interactive(seq)
    assert result["n_frames"] == 5
    assert result["ate_rmse"] < 0.02, result
