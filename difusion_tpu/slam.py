"""Online SLAM pipeline: track -> fuse -> mesh (reference pytorch/main.py).

The reference couples the per-frame loop to an Open3D GUI (main.py:105-155);
here the pipeline is a library class plus an offline CLI that dumps a TUM
trajectory, a PLY mesh, ATE against ground truth, and per-stage timings
(the observability the reference lacks, SURVEY.md section 5).

Per frame (reference refresh, main.py:42-102):
1. depth cut to the configured range,
2. ``SDFTracker.track_camera`` (GT/first pose on frame 0),
3. every ``integrate_interval`` frames: ``integrate_keyframe`` with the
   tracked pose applied to the processed point cloud, then incremental mesh
   extraction.

Host<->device traffic is one frame upload per step; everything else stays
jitted on device.
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import dict_to_args, load_yaml_args
from .core import hash_map as HM
from .core import map as M
from .core.meshing import HashMeshExtractor, MeshExtractor
from .core import tracker as tracker_mod
from .core.tracker import SDFTracker, TrackerConfig
from .data import FrameData, RGBDSequence, open_sequence
from .models.decoder import DecoderSpec, fold_decoder_params
from .models.encoder import fold_encoder_params
from .ops.imgproc import Intrinsic
from .utils.motion import Isometry, ate_rmse


from functools import partial


@partial(jax.jit, static_argnames=("tcfg", "map_cfg", "spec", "calib",
                                   "h", "w", "with_merge"))
def track_fuse_scan(tcfg: TrackerConfig, map_cfg, spec: DecoderSpec,
                    calib: Intrinsic, dec_params, enc_params, state,
                    last_R, last_t, prev_pyr, rgb_weight, n_unstable,
                    delta_R, delta_t, packed_chunk, do_integrate, h: int,
                    w: int, merge_at=None, merge_args=None,
                    with_merge: bool = False):
    """K sequential frame steps (unpack + preprocess + GN track + optional
    encoder fusion) as ONE ``lax.scan`` dispatch.

    Numerically identical to K ``process_frame`` calls (tested in
    tests/test_scan.py): the scan body is the same per-frame program; only
    the dispatch granularity changes.  On a remote/tunneled device transport
    every dispatch pays an RPC round trip, so batching K frames into one
    program amortizes that away; on a local TPU host it simply removes K-1
    dispatch latencies.  The reference has no analog -- its per-frame loop
    syncs to the host every GN iteration (reference tracker.py:170,218,272).

    ``packed_chunk``: (K, h, 3w) stacked :func:`~.core.tracker.pack_frame`
    byte-plane buffers ((K, h, 16w) for the lossless f32 packing).  ``do_integrate``: (K,) bool -- fuse that frame's point cloud
    into the map after tracking (the ``integrate_interval`` schedule).
    Returns (carry, (Rs, ts, energies)) where carry holds the final map
    state, tracker temporal state, the LAST frame's processed point
    cloud (pts_cam, normals_cam, pc_mask) so the caller can refresh
    ``tracker.last_processed`` -- a later per-frame integrate must fuse this
    chunk's final frame, not a stale pre-chunk one -- and the last
    INTEGRATED frame's world-space point cloud (int_pts, int_nrm, int_mask)
    so the caller can build latent-optimization samples for that keyframe.

    ``with_merge`` (static): fold a pending latent-optimizer result into the
    map inside the scan, at the step(s) flagged by ``merge_at`` (K,) bool --
    the per-frame path merges at the START of an integrate
    (:meth:`SLAMSystem.process_frame`; reference map.py:360-363), so the
    chunked path applies the merge at the chunk's first integrate frame,
    keeping intermediate frames tracking against the same (un-merged)
    latents as the per-frame path.  ``merge_args`` = (old_latents,
    new_latents, old_counts, touched, snap_opt_overflow).
    """
    integrate = (HM.integrate_keyframe if isinstance(map_cfg, HM.HashMapConfig)
                 else M.integrate_keyframe)

    def step(carry, inp):
        (state, lR, lt, prev, rw, nu, dR, dt, _, _, _,
         ipts, inrm, imask) = carry
        if with_merge:
            packed, integ, mnow = inp
        else:
            packed, integ = inp
        cur = tracker_mod.preprocess_frame_packed(tcfg, calib, packed, h, w)
        if tcfg.motion_prior == "constant_velocity":
            iR, it = dR, dt
        else:
            iR = jnp.eye(3, dtype=jnp.float32)
            it = jnp.zeros(3, jnp.float32)
        res = tracker_mod.gauss_newton(tcfg, map_cfg, spec, calib, dec_params,
                                       state, lR, lt, prev, cur, rw, nu,
                                       iR, it)

        w_pts = cur.pts_cam @ res.final_R.T + res.final_t
        w_nrm = cur.normals_cam @ res.final_R.T

        def fuse(st):
            if with_merge:
                def apply_merge(s):
                    old_lat, new_lat, old_cnt, touched, snap_of = merge_args
                    s = M.merge_optimize_result(s, old_lat, new_lat,
                                                old_cnt, touched)
                    return s._replace(opt_overflow=jnp.maximum(
                        s.opt_overflow, snap_of))
                st = jax.lax.cond(mnow, apply_merge, lambda s: s, st)
            return integrate(map_cfg, enc_params, st, w_pts, w_nrm,
                             cur.pc_mask)

        state = jax.lax.cond(integ, fuse, lambda st: st, state)
        ipts = jnp.where(integ, w_pts, ipts)
        inrm = jnp.where(integ, w_nrm, inrm)
        imask = jnp.where(integ, cur.pc_mask, imask)
        carry = (state, res.final_R, res.final_t, cur.pyramid,
                 res.rgb_weight, res.n_unstable, res.delta_R, res.delta_t,
                 cur.pts_cam, cur.normals_cam, cur.pc_mask,
                 ipts, inrm, imask)
        return carry, (res.final_R, res.final_t, res.final_energy)

    # seed the point-cloud carry slots with correctly-shaped zeros; K >= 1,
    # so the outputs always come from a real frame
    budget = tcfg.point_budget
    zpts = jnp.zeros((budget, 3), jnp.float32)
    zmask = jnp.zeros(budget, bool)
    carry0 = (state, last_R, last_t, prev_pyr, rgb_weight, n_unstable,
              delta_R, delta_t, zpts, zpts, zmask, zpts, zpts, zmask)
    xs = ((packed_chunk, do_integrate, merge_at) if with_merge
          else (packed_chunk, do_integrate))
    return jax.lax.scan(step, carry0, xs)


def load_prior(hyper_path: str, use_epoch: int = -1):
    """Load + fold a prior for the SLAM path.  Reads the reference's torch
    checkpoints (or a previously cached ``prior.npz`` next to hyper.json,
    avoiding the torch dependency on repeat runs)."""
    hyper_path = Path(hyper_path)
    cache = hyper_path.parent / f"prior_{use_epoch}.npz"
    from .models import torch_import as TI
    if cache.exists():
        loaded = TI.load_params_npz(str(cache))
        hyper = json.loads(hyper_path.read_text())
        dec_t, enc_t = loaded["decoder"], loaded["encoder"]
        spec_d, spec_e = DecoderSpec.from_hyper(hyper), None
    else:
        dec_t, enc_t, spec_d, spec_e, hyper = TI.load_torch_prior(str(hyper_path), use_epoch)
        try:
            TI.save_params_npz(str(cache), decoder=dec_t, encoder=enc_t)
        except OSError:
            pass
    dec = fold_decoder_params(jax.tree.map(jnp.asarray, dec_t))
    enc = fold_encoder_params(jax.tree.map(jnp.asarray, enc_t))
    return dec, enc, spec_d


class SLAMSystem:
    """Track + fuse + mesh over an RGB-D stream."""

    def __init__(self, map_cfg: M.MapConfig, tcfg: TrackerConfig,
                 dec_params: Dict[str, Any], enc_params: Dict[str, Any],
                 spec: DecoderSpec, calib: Intrinsic,
                 integrate_interval: int = 20,
                 depth_cut: tuple = (0.5, 5.0),
                 mesh_resolution: int = 4,
                 max_triangles: int = 1 << 22,
                 mesh_max_std: float = 0.15,
                 mesh_fast: bool = False,
                 meshing: bool = True,
                 meshing_interval: int = -1,
                 run_async: bool = False,
                 profile: bool = False,
                 latent_optimize: bool = False,
                 latent_optimize_mode: str = "interleaved",
                 optim_n_iters: int = 20,
                 code_reg_lambda: float = 0.0):
        self.map_cfg = map_cfg
        self.enc_params = enc_params
        self.is_hash = isinstance(map_cfg, HM.HashMapConfig)
        self._map_mod = HM if self.is_hash else M
        self.state = (HM.create_hash_map_state(map_cfg) if self.is_hash
                      else M.create_map_state(map_cfg))
        tcfg = tcfg._replace(depth_cut_min=float(depth_cut[0]),
                             depth_cut_max=float(depth_cut[1]))
        self.tracker = SDFTracker(map_cfg, tcfg, dec_params, spec, calib)
        mesher_cls = HashMeshExtractor if self.is_hash else MeshExtractor
        self.mesher = mesher_cls(map_cfg, dec_params, spec,
                                 voxel_resolution=mesh_resolution,
                                 max_triangles=max_triangles,
                                 fast=mesh_fast) if meshing else None
        self.integrate_interval = integrate_interval
        # the reference parses meshing_interval but meshing piggybacks on the
        # integrate branch (SURVEY.md 2.5); here it is honored when set
        self.meshing_interval = (meshing_interval if meshing_interval > 0
                                 else integrate_interval)
        # run_async: mesh extraction runs in a worker thread over an
        # immutable state snapshot (the reference's meshing thread + stream +
        # copy-on-write vars, map.py:232,620-626 -- functional state makes
        # the snapshot free)
        self.run_async = run_async
        self._mesh_executor = None
        self._mesh_future = None
        if run_async and meshing:
            from concurrent.futures import ThreadPoolExecutor
            self._mesh_executor = ThreadPoolExecutor(max_workers=1)
        self.depth_cut = depth_cut
        self.mesh_max_std = mesh_max_std
        self.first_iso: Optional[Isometry] = None
        # mapping-only: every frame takes its GT pose (no GN tracking)
        self.use_gt_poses = False
        # latent optimization of converged voxels (reference map.py step 3 +
        # OptimizeProcess; default off like the reference main path,
        # main.py:86).  "sync" commits immediately; "interleaved" merges the
        # result at the NEXT integrate with delta de-integration, the analog
        # of the reference's aux-GPU async process (XLA overlaps the work).
        self.latent_optimize = latent_optimize
        self.latent_optimize_mode = latent_optimize_mode
        self.optim_n_iters = optim_n_iters
        self.code_reg_lambda = code_reg_lambda
        self._pending_opt = None
        self._opt_key = jax.random.key(7)
        self.dec_params = dec_params
        self.spec = spec
        # profile=True inserts a device sync after each stage for per-stage
        # timings; profile=False lets the whole frame dispatch asynchronously
        self.profile = profile
        self.timings: Dict[str, List[float]] = {"track": [], "integrate": [], "mesh": []}

    @classmethod
    def from_config(cls, args, calib: Intrinsic, first_iso: Isometry,
                    capacity: int = 1 << 16, point_budget: int = 1 << 14,
                    meshing: bool = True) -> "SLAMSystem":
        """Build from a reference-style fusion config namespace
        (configs/fusion-lr-kt.yaml)."""
        dec, enc, spec = load_prior(args.training_hypers, args.using_epoch)
        mapping = dict_to_args(args.mapping) if isinstance(args.mapping, dict) else args.mapping
        tracking = dict_to_args(args.tracking) if isinstance(args.tracking, dict) else args.tracking
        # hash-indexed map when the scene is unbounded (no bounds in the
        # config) or explicitly requested via `indexer: hash`
        if getattr(mapping, "indexer", None) == "hash" \
                or not hasattr(mapping, "bound_min"):
            map_cfg = HM.HashMapConfig.from_args(mapping, latent_dim=spec.latent_size,
                                                 capacity=capacity,
                                                 table_size=4 * capacity)
        else:
            map_cfg = M.MapConfig.from_args(mapping, latent_dim=spec.latent_size,
                                            capacity=capacity)
        tcfg = TrackerConfig.from_args(tracking, point_budget=point_budget)
        sys = cls(map_cfg, tcfg, dec, enc, spec, calib,
                  integrate_interval=int(getattr(args, "integrate_interval", 20)),
                  depth_cut=(float(getattr(args, "depth_cut_min", 0.5)),
                             float(getattr(args, "depth_cut_max", 5.0))),
                  mesh_resolution=int(getattr(args, "resolution", 4)),
                  # reference extract_mesh defaults fast=True (map.py:581);
                  # config key `mesh_fast` opts the incremental path in
                  mesh_fast=bool(getattr(args, "mesh_fast", False)),
                  meshing_interval=int(getattr(args, "meshing_interval", -1)),
                  run_async=bool(getattr(args, "run_async", False)),
                  meshing=meshing,
                  # latent-optimize keys live under mapping in the reference
                  # (read at map.py:97-104,460; absent from shipped configs
                  # because the main path passes do_optimize=False)
                  latent_optimize=bool(getattr(mapping, "latent_optimize", False)),
                  optim_n_iters=int(getattr(mapping, "optim_n_iters", 20)),
                  code_reg_lambda=(float(getattr(mapping, "code_reg_lambda", 0.0))
                                   if getattr(mapping, "code_regularization", False)
                                   else 0.0))
        sys.first_iso = first_iso
        return sys

    # -- per-frame step ------------------------------------------------------

    def process_frame(self, frame: FrameData,
                      packed: Optional[jnp.ndarray] = None):
        """Track (+ periodically fuse/mesh) one frame.  Returns the device
        pose (ops.se3.Pose); use ``tracker.pose_at(-1)`` for an Isometry.

        ``packed``: optionally a device-resident :func:`pack_frame` buffer
        for this frame (from the upload pipeline); avoids re-uploading."""
        t0 = time.perf_counter()
        set_pose = None
        if self.use_gt_poses:
            # mapping-only mode (BASELINE eval config 2): fuse under the
            # sequence's ground-truth trajectory, no tracking
            assert frame.gt_pose is not None, "use_gt_poses needs load_gt"
            set_pose = frame.gt_pose
        elif self.tracker.n_tracked == 0:
            set_pose = self.first_iso if self.first_iso is not None else (
                frame.gt_pose if frame.gt_pose is not None else Isometry())
        h, w = frame.depth.shape
        if packed is None:
            packed = jnp.asarray(tracker_mod.pack_frame(
                frame.rgb, frame.depth, self.tracker.calib.dcam_scale,
                lossless=self.tracker.tcfg.lossless_packing))
        pose = self.tracker.track_camera_packed(
            self.state, packed, h, w, set_pose)
        if self.profile:
            jax.block_until_ready(pose.t)
            self.timings["track"].append(time.perf_counter() - t0)

        n_done = self.tracker.n_tracked
        if (n_done - 1) % self.integrate_interval == 0:
            t0 = time.perf_counter()
            # merge a pending optimizer result first (reference merges at the
            # start of integrate_keyframe, map.py:360-363)
            if self._pending_opt is not None:
                old_lat, old_cnt, pre_optimized, opt_state = self._pending_opt
                touched = opt_state.optimized & ~pre_optimized
                self.state = self._map_mod.merge_optimize_result(
                    self.state, old_lat, opt_state.latents, old_cnt, touched)
                # counters only grow; the snapshot's opt_overflow includes
                # everything up to the optimize call, ours everything since
                self.state = self.state._replace(opt_overflow=jnp.maximum(
                    self.state.opt_overflow, opt_state.opt_overflow))
                self._pending_opt = None
            w_pts, w_nrm, w_mask = self.tracker.last_pc_world(pose)
            self.state = self._map_mod.integrate_keyframe(
                self.map_cfg, self.enc_params, self.state, w_pts, w_nrm, w_mask)
            if self.latent_optimize:
                self._opt_key, sub = jax.random.split(self._opt_key)
                slot_ids, rel, gt, mask = self._map_mod.build_optimize_samples(
                    self.map_cfg, self.state, w_pts, w_nrm, w_mask, sub)
                opt_state = self._map_mod.optimize_latents(
                    self.map_cfg, self.dec_params, self.spec, self.state,
                    slot_ids, rel, gt, mask, n_iters=self.optim_n_iters,
                    code_reg_lambda=self.code_reg_lambda)
                if self.latent_optimize_mode == "sync":
                    self.state = opt_state
                else:
                    self._pending_opt = (self.state.latents, self.state.obs_count,
                                         self.state.optimized, opt_state)
            if self.profile:
                jax.block_until_ready(self.state.latents)
                self.timings["integrate"].append(time.perf_counter() - t0)

        if self.mesher is not None and (n_done - 1) % self.meshing_interval == 0:
            t0 = time.perf_counter()
            if self._mesh_executor is not None:
                # snapshot is free (immutable pytree); clear dirty flags now
                # so fusion keeps marking new work for the NEXT extract
                snapshot = self.state
                self.state = self.mesher._clear_dirty(self.state)
                if self._mesh_future is not None:
                    self._mesh_future.result()     # one extract in flight
                self._mesh_future = self._mesh_executor.submit(
                    self.mesher.extract, snapshot, self.mesh_max_std)
            else:
                self.state = self.mesher.extract(self.state, max_std=self.mesh_max_std)
            if self.profile:
                self.timings["mesh"].append(time.perf_counter() - t0)
        return pose

    def finish_meshing(self):
        """Join any in-flight async mesh extraction."""
        if self._mesh_future is not None:
            self._mesh_future.result()
            self._mesh_future = None

    # -- chunked step (one dispatch per K frames) ----------------------------

    def process_chunk(self, packed_chunk: jnp.ndarray, h: int, w: int):
        """Track + fuse K frames as ONE :func:`track_fuse_scan` dispatch.

        Same per-frame semantics as K :meth:`process_frame` calls with the
        ``integrate_interval`` schedule; mesh extraction (if enabled) runs
        once after the chunk, which matches the reference's behavior of
        meshing on integrate frames when ``meshing_interval`` divides the
        chunk size.  Frame 0 must have been processed via
        :meth:`process_frame` first (it seeds the pose).

        Latent optimization composes with the chunked dispatch (the
        reference's whole OptimizeProcess design is optimization CONCURRENT
        with tracking, map.py:29-113,498-513): a pending optimizer result is
        merged inside the scan at the chunk's first integrate frame (same
        point in the schedule as the per-frame path), and after the chunk a
        new ``optimize_latents`` round runs on the chunk's last integrated
        keyframe -- XLA dispatches it asynchronously, so it overlaps the
        next chunk's host-side packing the way the reference's aux-GPU
        process overlaps tracking.  With one integrate per chunk this is
        step-for-step identical to the per-frame interleaved path (tested);
        with several, optimization runs once per chunk on the last keyframe.
        """
        assert self.tracker.n_tracked > 0, "process frame 0 first (set_pose)"
        assert not self.use_gt_poses, \
            "gt-pose (mapping-only) mode uses the per-frame path"
        K = int(packed_chunk.shape[0])
        start = self.tracker.n_tracked
        integ_idx = [k for k in range(K)
                     if (start + k) % self.integrate_interval == 0]
        do_integrate = jnp.asarray(
            [(start + k) % self.integrate_interval == 0 for k in range(K)])
        merge_at, merge_args, with_merge = None, None, False
        if self._pending_opt is not None and integ_idx:
            old_lat, old_cnt, pre_optimized, opt_state = self._pending_opt
            touched = opt_state.optimized & ~pre_optimized
            merge_args = (old_lat, opt_state.latents, old_cnt, touched,
                          opt_state.opt_overflow)
            merge_at = jnp.asarray([k == integ_idx[0] for k in range(K)])
            with_merge = True
            self._pending_opt = None
        tr = self.tracker
        carry, (Rs, ts, energies) = track_fuse_scan(
            tr.tcfg, self.map_cfg, self.spec, tr.calib, self.dec_params,
            self.enc_params, self.state, tr.last_pose.R, tr.last_pose.t,
            tr.last_pyramid, tr.rgb_weight, tr.n_unstable,
            tr.last_delta.R, tr.last_delta.t, packed_chunk, do_integrate,
            h, w, merge_at=merge_at, merge_args=merge_args,
            with_merge=with_merge)
        (self.state, _, _, tr.last_pyramid, tr.rgb_weight, tr.n_unstable,
         dR, dt, last_pts, last_nrm, last_mask,
         int_pts, int_nrm, int_mask) = carry
        if self.latent_optimize and integ_idx:
            self._opt_key, sub = jax.random.split(self._opt_key)
            slot_ids, rel, gt, mask = self._map_mod.build_optimize_samples(
                self.map_cfg, self.state, int_pts, int_nrm, int_mask, sub)
            opt_state = self._map_mod.optimize_latents(
                self.map_cfg, self.dec_params, self.spec, self.state,
                slot_ids, rel, gt, mask, n_iters=self.optim_n_iters,
                code_reg_lambda=self.code_reg_lambda)
            if self.latent_optimize_mode == "sync":
                self.state = opt_state
            else:
                self._pending_opt = (self.state.latents, self.state.obs_count,
                                     self.state.optimized, opt_state)
        tr.last_delta = tracker_mod.Pose(dR, dt)
        # keep last_processed fresh: a later per-frame integrate step fuses
        # via tracker.last_pc_world, which must see THIS chunk's final frame
        tr.last_processed = tracker_mod.ProcessedFrame(
            pyramid=tr.last_pyramid, pts_cam=last_pts, normals_cam=last_nrm,
            pc_mask=last_mask)
        tr.append_pose_chunk(Rs, ts)
        # honor the meshing schedule like the per-frame path (one extract
        # after the chunk when any frame in it hits the interval)
        if self.mesher is not None and any(
                (start + k) % self.meshing_interval == 0 for k in range(K)):
            self.state = self.mesher.extract(self.state,
                                             max_std=self.mesh_max_std)
        return tr.last_pose

    # -- offline driver ------------------------------------------------------

    def run_sequence(self, sequence: RGBDSequence,
                     max_frames: int = -1,
                     prefetch: int = 3,
                     chunk: int = 0) -> Dict[str, Any]:
        """Run the full sequence with a background load+upload pipeline: a
        side thread decodes/renders frames, packs them and issues the
        host->device transfers, overlapping IO and transfer latency with the
        device compute of previous frames.

        ``chunk > 1`` batches that many frames into one
        :func:`track_fuse_scan` dispatch (same semantics, see
        :meth:`process_chunk`; composes with ``latent_optimize``).  On
        remote transports this amortizes the per-dispatch RPC; poses are
        identical to the per-frame path (tests/test_scan.py)."""
        import queue
        import threading

        n = len(sequence) if max_frames < 0 else min(max_frames, len(sequence))
        self.first_iso = self.first_iso or sequence.first_iso
        start = self.tracker.n_tracked   # this call's slice of the history
        use_chunk = chunk if (chunk > 1 and not self.use_gt_poses) else 0

        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))

        def feeder():
            try:
                dcam = self.tracker.calib.dcam_scale
                batch: list = []
                for i, frame in enumerate(sequence):
                    if i >= n:
                        break
                    h, w = frame.depth.shape
                    pk = tracker_mod.pack_frame(
                        frame.rgb, frame.depth, dcam,
                        lossless=self.tracker.tcfg.lossless_packing)
                    if not use_chunk or (i == 0 and self.tracker.n_tracked == 0):
                        q.put(("frame", frame, jnp.asarray(pk), h, w))
                    else:
                        batch.append(pk)
                        if len(batch) == use_chunk:
                            q.put(("chunk", None, jnp.asarray(np.stack(batch)), h, w))
                            batch = []
                if batch:
                    q.put(("chunk", None, jnp.asarray(np.stack(batch)), h, w))
            except Exception as e:          # surface loader errors downstream
                q.put(e)
            q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        i = 0
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            kind, frame, packed, h, w = item
            if kind == "chunk":
                self.process_chunk(packed, h, w)
                i += int(packed.shape[0])
            else:
                self.process_frame(frame, packed=packed)
                i += 1
            if i % 25 < (use_chunk or 1):
                logging.info("frame %d/%d", i, n)
        self.finish_meshing()
        trajectory = self.tracker.all_pd_pose[start:]
        result: Dict[str, Any] = {
            "n_frames": len(trajectory),
            "trajectory": trajectory,
            "n_voxels": int(self.state.n_occupied),
            # capacity-pressure counters: allocations dropped at the map's
            # slot capacity (or hash probe limit) and latent-optimizer
            # working-table truncations -- nonzero values mean the run
            # quietly lost coverage and capacity/table sizes need raising
            "alloc_overflow": int(self.state.overflow),
            "opt_overflow": int(self.state.opt_overflow),
        }
        if sequence.gt_trajectory is not None and all(
                g is not None for g in sequence.gt_trajectory[:len(trajectory)]):
            gt = sequence.gt_trajectory[:len(trajectory)]
            result["ate_rmse"] = ate_rmse(gt, trajectory)
        for k, v in self.timings.items():
            if v:
                # median = steady-state signal: the FIRST call of every
                # stage absorbs the process's compile/warmup (on the
                # remote-compile transport that is minutes, and the first
                # device sync of the run pays for every queued program), so
                # a mean over few samples reported compile time as if it
                # were stage time.  The first call is surfaced separately.
                result[f"{k}_ms"] = 1e3 * float(np.median(v))
                result[f"{k}_first_ms"] = 1e3 * float(v[0])
        return result

    def save_trajectory(self, path: str):
        """TUM format: id tx ty tz qx qy qz qw."""
        with open(path, "w") as f:
            for i, p in enumerate(self.tracker.all_pd_pose):
                qx, qy, qz = p.q.vector
                f.write(f"{i} {p.t[0]} {p.t[1]} {p.t[2]} {qx} {qy} {qz} {p.q.w}\n")

    def save_map(self, path: str):
        self._map_mod.save_map(path, self.map_cfg, self.state)

    # -- interactive driver --------------------------------------------------

    def run_interactive(self, sequence: RGBDSequence,
                        max_frames: int = -1,
                        out_dir: Optional[str] = None) -> Dict[str, Any]:
        """Terminal step-through, the reference GUI's key-callback loop
        (reference main.py:136-148: ',' steps one frame, '.' free-runs)
        without the Open3D window:

        =========  =========================================================
        Enter / s  step one frame
        r [N]      run to the end (or N more frames)
        m          extract + report the mesh now
        v          render the current mesh + trajectory to view_<i>.png
        i          info: frame counter, pose, voxel count, GN energy
        q          stop (artifacts are still written by the caller)
        =========  =========================================================
        """
        n = len(sequence) if max_frames < 0 else min(max_frames, len(sequence))
        self.first_iso = self.first_iso or sequence.first_iso
        it = iter(sequence)
        i = 0
        free_run = 0
        print(self.run_interactive.__doc__.split('\n', 1)[1])
        while i < n:
            if free_run <= 0:
                try:
                    cmd = input(f"[frame {i}/{n}] > ").strip().split()
                except EOFError:
                    cmd = ["r"]
                op = cmd[0] if cmd else "s"
                if op == "q":
                    break
                if op == "r":
                    free_run = int(cmd[1]) if len(cmd) > 1 else n - i
                    continue
                if op == "m":
                    if self.mesher is None:
                        print("meshing disabled (--no-mesh)")
                    else:
                        self.state = self.mesher.extract(
                            self.state, max_std=self.mesh_max_std)
                        tris, _ = self.mesher.triangles()
                        print(f"mesh: {len(tris)} triangles, "
                              f"{int(self.state.n_occupied)} voxels")
                    continue
                if op == "v":
                    self._interactive_view(out_dir or ".", i)
                    continue
                if op == "i":
                    if self.tracker.last_pose is not None:
                        t = np.asarray(self.tracker.last_pose.t)
                        print(f"frame {i}: t={np.round(t, 4)}  "
                              f"voxels={int(self.state.n_occupied)}")
                    else:
                        print("no frames tracked yet")
                    continue
                # fall through: "s" / empty = step
            else:
                free_run -= 1
            frame = next(it)
            self.process_frame(frame)
            i += 1
        self.finish_meshing()
        trajectory = self.tracker.all_pd_pose
        result: Dict[str, Any] = {"n_frames": i, "trajectory": trajectory,
                                  "n_voxels": int(self.state.n_occupied),
                                  "alloc_overflow": int(self.state.overflow),
                                  "opt_overflow": int(self.state.opt_overflow)}
        if sequence.gt_trajectory is not None and all(
                g is not None for g in sequence.gt_trajectory[:i]):
            result["ate_rmse"] = ate_rmse(sequence.gt_trajectory[:i], trajectory)
        return result

    def _interactive_view(self, out_dir: str, i: int) -> None:
        """Render mesh + trajectory via tools/view.py's renderer."""
        if self.mesher is None:
            print("meshing disabled (--no-mesh)")
            return
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
        try:
            import view as view_mod
        except ImportError:
            print("tools/view.py not importable")
            return
        finally:
            sys.path.pop(0)
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        png = str(Path(out_dir) / f"view_{i:04d}.png")
        verts, faces = self.mesher.vertices_faces()
        stds = self.mesher.triangles()[1].reshape(-1)
        if len(stds):
            t = np.clip((stds - stds.min())
                        / max(stds.max() - stds.min(), 1e-12), 0.0, 1.0)
            import matplotlib.cm as cm
            colors = (cm.jet(t)[:, :3] * 255).astype(np.uint8)
        else:
            colors = None
        traj = np.array([p.t for p in self.tracker.all_pd_pose]) \
            if self.tracker.n_tracked else None
        view_mod.view_matplotlib(verts, colors, faces, traj, None, save=png)


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="difusion-tpu SLAM")
    parser.add_argument("config", help="fusion yaml (reference format)")
    parser.add_argument("--max-frames", type=int, default=-1)
    parser.add_argument("--output", type=str, default="slam_out")
    parser.add_argument("--no-mesh", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="per-stage device-synced timings")
    parser.add_argument("--xprof", type=str, default="",
                        help="capture a jax profiler trace into this dir")
    parser.add_argument("--chunk", type=int, default=0,
                        help="batch N frames per dispatch (lax.scan; same "
                             "poses as per-frame, amortizes RPC overhead on "
                             "remote transports)")
    parser.add_argument("--interactive", action="store_true",
                        help="terminal step-through (the reference GUI's "
                             "','/'.'-key loop): Enter steps, r runs, m "
                             "meshes, v renders a view, q quits")
    parser.add_argument("--gt-poses", action="store_true",
                        help="mapping-only: fuse under the ground-truth "
                             "trajectory, no tracking (BASELINE config 2)")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="override a (possibly nested, dot-separated) "
                             "config key, e.g. --set sequence_kwargs.path=X "
                             "--set tracking.rgb.weight=300 (the reference "
                             "CLI's config-key flags, exp_util.py:78-112)")
    cli = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from .utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    args = load_yaml_args(cli.config)
    from .config import apply_override
    for assignment in cli.overrides:
        apply_override(args, assignment)
    seq = open_sequence(args.sequence_type, **args.sequence_kwargs)
    calib = seq.calib if hasattr(seq, "calib") else None
    system = SLAMSystem.from_config(args, calib, seq.first_iso,
                                    meshing=not cli.no_mesh)
    system.profile = cli.profile
    system.use_gt_poses = cli.gt_poses
    if cli.interactive:
        result = system.run_interactive(seq, cli.max_frames,
                                        out_dir=cli.output)
    elif cli.xprof:
        import jax.profiler
        with jax.profiler.trace(cli.xprof):
            result = system.run_sequence(seq, cli.max_frames, chunk=cli.chunk)
    else:
        result = system.run_sequence(seq, cli.max_frames, chunk=cli.chunk)

    out = Path(cli.output)
    out.mkdir(parents=True, exist_ok=True)
    system.save_trajectory(str(out / "trajectory.txt"))
    system.save_map(str(out / "map.npz"))
    if system.mesher is not None:
        system.mesher.write_ply(str(out / "mesh.ply"))
    summary = {k: v for k, v in result.items() if k != "trajectory"}
    print(json.dumps(summary, indent=2, default=float))
    return result


if __name__ == "__main__":
    main()
