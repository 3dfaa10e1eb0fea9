"""Benchmark: online track+fuse throughput on a synthetic ICL-NUIM-shaped
sequence (640x480 RGB-D, reference intrinsics), the BASELINE.json headline
metric.  No dataset files are required: the analytic renderer drives the
identical compute path (preprocess -> GN track -> encoder fusion).

Methodology: several full passes over the sequence, each timed around the
frame loop with ONE device sync at the end of the pass (the final pose
transitively depends on every frame's preprocess+track, and the map state on
every integrate, so the sync covers all enqueued work).  Per-frame or
per-segment syncs are NOT taken inside the loop: on this tunneled backend a
single host<->device round trip costs ~30 ms, which would measure transport
latency rather than pipeline throughput.  The headline value is the MEAN
fps over passes; the best pass is reported alongside.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "best",
"passes"} where vs_baseline is the mean relative to the BASELINE north-star
target of 30 fps track+fuse on one TPU chip.
"""
import json
import os
import time


def main():
    import jax
    import numpy as np

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from difusion_tpu.core import map as M
    from difusion_tpu.core.tracker import TrackerConfig
    from difusion_tpu.data import SyntheticSequence
    from difusion_tpu.ops.imgproc import Intrinsic
    from difusion_tpu.slam import SLAMSystem

    # prior: reference checkpoint when present, random init otherwise
    # (throughput is parameter-value independent)
    hyper = "/root/reference/pytorch/ckpt/default/hyper.json"
    if os.path.exists(hyper):
        from difusion_tpu.slam import load_prior
        dec, enc, spec_d = load_prior(hyper, 300)
    else:
        import jax.numpy as jnp
        from difusion_tpu.models.decoder import (DecoderSpec, fold_decoder_params,
                                                 init_decoder_params)
        from difusion_tpu.models.encoder import (EncoderSpec, fold_encoder_params,
                                                 init_encoder_params)
        spec_d = DecoderSpec()
        dec = fold_decoder_params(init_decoder_params(spec_d, jax.random.key(0)))
        enc = fold_encoder_params(init_encoder_params(EncoderSpec(), jax.random.key(1)))

    calib = Intrinsic(481.2, 480.0, 319.5, 239.5, 5000.0)  # ICL-NUIM
    seq = SyntheticSequence(n_frames=40, h=480, w=640, calib=calib,
                            corrugation=0.1, motion_scale=0.5)
    map_cfg = M.MapConfig(bound_min=(-3.5, -3.5, -0.5), n_xyz=(70, 70, 40),
                          voxel_size=0.1, latent_dim=spec_d.latent_size,
                          capacity=1 << 16, prune_min_vox_obs=16,
                          ignore_count_th=16.0, encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=1 << 13)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec_d, calib,
                        integrate_interval=20, depth_cut=(0.5, 5.0),
                        meshing=False)

    import queue
    import threading

    from difusion_tpu.core import tracker as tracker_mod
    import jax.numpy as jnp

    # pre-render on the host (real datasets decode PNGs in a few ms; the
    # analytic renderer takes far longer and must stay out of the loop)
    all_frames = [next(seq) for _ in range(len(seq))]

    # warmup: compile preprocess/GN/integrate on identically-shaped frames
    for f in all_frames[:4]:
        system.process_frame(f)
    # drain before starting the clock (np.asarray is a real transfer;
    # block_until_ready can be a no-op on tunneled backends, and the last
    # pose transitively depends on every frame's preprocess+track)
    np.asarray(system.tracker.pose_history[-1].t)

    def sync():
        np.asarray(system.tracker.pose_history[-1].t)
        np.asarray(system.state.latents[0, 0])

    # feeder thread packs + uploads; main thread tracks (the run_sequence
    # pipeline, timed around the frame loop only)
    bench_frames = all_frames[4:]
    n = len(bench_frames)
    passes = 6
    q = queue.Queue(maxsize=3)

    def feeder():
        for _ in range(passes):
            for f in bench_frames:
                q.put((f, jnp.asarray(tracker_mod.pack_frame(
                    f.rgb, f.depth, calib.dcam_scale))))
        q.put(None)

    threading.Thread(target=feeder, daemon=True).start()
    pass_t = []
    i = 0
    t0 = time.perf_counter()
    while True:
        item = q.get()
        if item is None:
            break
        frame, packed = item
        system.process_frame(frame, packed=packed)
        i += 1
        if i % n == 0:                       # end of a pass: drain + restart
            sync()
            pass_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()

    fps = [n / t for t in pass_t]
    mean_fps = float(np.mean(fps))
    best_fps = float(np.max(fps))
    print(json.dumps({"metric": "synthetic_icl_track_fuse_fps",
                      "value": round(mean_fps, 2), "unit": "frames/sec",
                      "vs_baseline": round(mean_fps / 30.0, 3),
                      "best": round(best_fps, 2), "passes": len(fps)}))


if __name__ == "__main__":
    main()
