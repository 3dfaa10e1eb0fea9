"""Benchmark: online track+fuse throughput on a synthetic ICL-NUIM-shaped
sequence (640x480 RGB-D, reference intrinsics), the BASELINE.json headline
metric.  No dataset files are required: the analytic renderer drives the
identical compute path (preprocess -> GN track -> encoder fusion).

Methodology.  Frames are processed in CHUNKS of 12: each chunk is one
``slam.track_fuse_scan`` dispatch (a ``lax.scan`` over the per-frame
program -- numerically identical to per-frame calls, tests/test_scan.py), and
each chunk's packed frames upload as one stacked buffer from a background
feeder thread.  On this tunneled backend a dispatch costs ~1-2 ms and a
device->host sync ~28 ms, and after the first sync the runtime pays that
dispatch overhead on EVERY program launch -- chunking keeps the overhead at
~3 dispatches per pass instead of 36.  One sync per pass (the final pose +
a map latent transitively depend on every frame's track and every
integrate).  The headline is the MEAN fps over passes; the best pass is
reported alongside.

The same line always carries ``resident_fps``: the pure-compute rate with
frames pre-uploaded (what a non-tunneled TPU host would stream at, since
PCIe moves 0.9 MB/frame in well under a millisecond) -- the transport-free
signal the transport-bound headline hides.  If tools/roofline.py has written
BENCH_ROOFLINE.json, its per-stage device budget (stage_ms, decoder_mfu)
is merged into the line.

Transport auditability (round-4 verdict): the line also records a direct
measurement of the tunnel itself -- ``upload_gbps`` (median of dedicated
upload passes), ``upload_ms_per_frame``, ``sync_ms``, ``fps_per_pass`` --
plus ``streaming_model_fps`` = 1e3/max(upload_ms, compute_ms) and
``streaming_bound``: with the feeder overlapping uploads against compute,
the streaming ceiling is whichever of the two is slower, so a below-target
median is attributable inside the artifact (slow-tunnel day vs streaming-
path regression).  ``speed_config`` carries the bf16/stride preset's fps
WITH its measured ATE deltas beside it (never fps alone).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "median",
"best", "passes", "resident_fps", "frame_ms", "upload_gbps", ...}.
"""
import argparse
import json
import os
import time
from pathlib import Path

# chunk length of the streaming scan dispatch; BENCH_CHUNK overrides for
# transport experiments (larger chunks amortize per-dispatch overhead and
# give the tunnel bigger sequential uploads -- round-4 verdict item 3)
CHUNK = int(os.environ.get("BENCH_CHUNK", "12"))
PASSES = int(os.environ.get("BENCH_PASSES", "8"))


def build_system(n_chunks: int = 3, point_budget: int = 1 << 13,
                 tcfg_overrides: dict = None):
    """Build the benchmark SLAM system, pre-render + pack the frames, and
    warm up (frame 0 set-pose path + one compiled chunk).  Returns
    (system, bench_chunks, h, w) with bench_chunks a list of ``n_chunks``
    host-packed (CHUNK, L) uint8 stacks.  ``tcfg_overrides`` replaces
    TrackerConfig fields (e.g. the bf16/stride-2 speed opt-ins)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from difusion_tpu.core import map as M
    from difusion_tpu.core import tracker as tracker_mod
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
        from difusion_tpu.models.decoder import (DecoderSpec, fold_decoder_params,
                                                 init_decoder_params)
        from difusion_tpu.models.encoder import (EncoderSpec, fold_encoder_params,
                                                 init_encoder_params)
        spec_d = DecoderSpec()
        dec = fold_decoder_params(init_decoder_params(spec_d, jax.random.key(0)))
        enc = fold_encoder_params(init_encoder_params(EncoderSpec(), jax.random.key(1)))

    calib = Intrinsic(481.2, 480.0, 319.5, 239.5, 5000.0)  # ICL-NUIM
    n_bench = n_chunks * CHUNK
    seq = SyntheticSequence(n_frames=1 + CHUNK + n_bench, h=480, w=640,
                            calib=calib, corrugation=0.1, motion_scale=0.5)
    map_cfg = M.MapConfig(bound_min=(-3.5, -3.5, -0.5), n_xyz=(70, 70, 40),
                          voxel_size=0.1, latent_dim=spec_d.latent_size,
                          capacity=1 << 16, prune_min_vox_obs=16,
                          ignore_count_th=16.0, encoder_count_th=600.0)
    tcfg = TrackerConfig(point_budget=point_budget, **(tcfg_overrides or {}))
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec_d, calib,
                        integrate_interval=20, depth_cut=(0.5, 5.0),
                        meshing=False)

    h, w = 480, 640
    # pre-render + pack on the host (real datasets decode PNGs in a few ms;
    # the analytic renderer takes far longer and must stay out of the loop)
    all_frames = [next(seq) for _ in range(len(seq))]
    packed_np = [tracker_mod.pack_frame(f.rgb, f.depth, calib.dcam_scale)
                 for f in all_frames]

    # warmup: frame 0 (set_pose path) + one chunk (compiles the scan)
    system.process_frame(all_frames[0], packed=jnp.asarray(packed_np[0]))
    system.process_chunk(jnp.asarray(np.stack(packed_np[1:1 + CHUNK])), h, w)
    np.asarray(system.tracker.last_pose.t)   # drain; compile is done

    bench_chunks = [np.stack(packed_np[1 + CHUNK + i:1 + CHUNK + i + CHUNK])
                    for i in range(0, n_bench, CHUNK)]
    return system, bench_chunks, h, w


def measure_resident(system, bench_chunks, h, w, passes: int = 4):
    """Pure-compute fps: chunks pre-uploaded, one sync per pass."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev_chunks = [jnp.asarray(c) for c in bench_chunks]
    jax.block_until_ready(dev_chunks)
    np.asarray(system.tracker.last_pose.t)
    n_bench = len(bench_chunks) * CHUNK
    fps = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for c in dev_chunks:
            system.process_chunk(c, h, w)
        np.asarray(system.tracker.last_pose.t)
        fps.append(n_bench / (time.perf_counter() - t0))
    return fps


def measure_transport(bench_chunks, passes: int = 3):
    """Direct tunnel-transport measurement, so the streaming headline is
    auditable (round-4 verdict weak #1): upload every chunk and force
    materialization with a trivial per-chunk reduction, one sync per pass.
    Returns {"upload_gbps", "upload_ms_per_frame", "bytes_per_frame",
    "sync_ms"} -- the numbers that let a reader separate a streaming-path
    regression from a slow tunnel day."""
    import jax.numpy as jnp
    import numpy as np

    bytes_per_chunk = bench_chunks[0].nbytes
    n_frames = len(bench_chunks) * CHUNK
    # prime one transfer so client-side setup stays out of the clock
    np.asarray(jnp.asarray(bench_chunks[0]).sum(dtype=jnp.int32))
    rates = []
    for _ in range(passes):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for c in bench_chunks:
            acc = acc + jnp.asarray(c).sum(dtype=jnp.int32)
        np.asarray(acc)
        dt = time.perf_counter() - t0
        rates.append(len(bench_chunks) * bytes_per_chunk / dt)
    # device->host sync latency: tiny-read round trips
    t0 = time.perf_counter()
    k = 5
    for _ in range(k):
        np.asarray(acc)
    sync_ms = (time.perf_counter() - t0) / k * 1e3
    gbps = float(np.median(rates)) / 1e9
    return {"upload_gbps": round(gbps, 4),
            "upload_gbps_per_pass": [round(r / 1e9, 4) for r in rates],
            "upload_ms_per_frame": round(
                bytes_per_chunk / CHUNK / (gbps * 1e9) * 1e3, 3),
            "bytes_per_frame": bytes_per_chunk // CHUNK,
            "sync_ms": round(sync_ms, 2),
            "transport_frames_measured": n_frames * passes}


def main(resident_only: bool = False):
    import numpy as np

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import jax.numpy as jnp

    system, bench_chunks, h, w = build_system(n_chunks=3)
    n_bench = len(bench_chunks) * CHUNK

    if resident_only:
        fps = measure_resident(system, bench_chunks, h, w, passes=4)
        print(json.dumps({"metric": "synthetic_icl_track_fuse_fps_resident",
                          "value": round(float(np.mean(fps)), 2),
                          "unit": "frames/sec",
                          "vs_baseline": round(float(np.mean(fps)) / 30.0, 3),
                          "best": round(float(np.max(fps)), 2),
                          "passes": len(fps)}))
        return

    transport = measure_transport(bench_chunks)

    import queue
    import threading

    q = queue.Queue(maxsize=4)

    def feeder():
        for _ in range(PASSES):
            for c in bench_chunks:
                q.put(jnp.asarray(c))       # one stacked upload per chunk
        q.put(None)

    threading.Thread(target=feeder, daemon=True).start()

    def sync():
        np.asarray(system.tracker.last_pose.t)
        np.asarray(system.state.latents[0, 0])

    pass_t = []
    i = 0
    t0 = time.perf_counter()
    while True:
        item = q.get()
        if item is None:
            break
        system.process_chunk(item, h, w)
        i += CHUNK
        if i % n_bench == 0:                 # end of a pass: drain + restart
            sync()
            pass_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()

    fps = [n_bench / t for t in pass_t]
    mean_fps = float(np.mean(fps))

    res_fps = measure_resident(system, bench_chunks, h, w, passes=4)
    resident = float(np.mean(res_fps))

    # the speed opt-in's pure-compute rate.  Round-4 verdict weak #5: the
    # preset's fps must never travel without its measured accuracy cost --
    # the ATE deltas ride in the same dict (from the committed accuracy
    # artifact), and the README documents the trade's only defensible
    # use-case (throughput-first mapping with GT/loose poses).
    speed_sys, speed_chunks, _, _ = build_system(
        n_chunks=3, tcfg_overrides=dict(rgb_stride=(1, 2, 2),
                                        sdf_compute_dtype="bfloat16"))
    sp = measure_resident(speed_sys, speed_chunks, h, w, passes=3)
    speed_resident = float(np.mean(sp))
    speed_cfg = {"resident_fps": round(speed_resident, 2)}
    for acc_name in ("ACCURACY_r05.json", "ACCURACY_r04.json"):
        acc_path = Path(__file__).resolve().parent / acc_name
        if acc_path.exists():
            try:
                rows = json.loads(acc_path.read_text())
                ate = {r["seq"]: r["ate_rmse"]
                       for r in rows.get("slam", [])
                       if r.get("config") == "speed" and "ate_rmse" in r}
                ate_def = {r["seq"]: r["ate_rmse"]
                           for r in rows.get("slam", [])
                           if r.get("config") == "default" and "ate_rmse" in r}
                if ate:
                    speed_cfg["ate_rmse"] = ate
                    speed_cfg["ate_cost_pct_vs_default"] = {
                        k: round(100.0 * (v / ate_def[k] - 1.0), 1)
                        for k, v in ate.items() if ate_def.get(k)}
                    speed_cfg["accuracy_source"] = acc_name
                    break   # only stop once speed rows were actually found
                            # -- an artifact without them must fall through
                            # to the older one (fps never ships bare)
            except Exception:
                pass

    # transport attribution: with the feeder overlapping uploads against
    # compute, the streaming ceiling is max(upload, compute) per frame --
    # publish the model so a below-target median is attributable in the
    # artifact itself (upload-bound vs compute-bound vs neither=regression)
    upload_ms = transport["upload_ms_per_frame"]
    compute_ms = 1e3 / resident
    model_fps = 1e3 / max(upload_ms, compute_ms)
    bound = "transport" if upload_ms > compute_ms else "compute"

    line = {"metric": "synthetic_icl_track_fuse_fps",
            "value": round(mean_fps, 2), "unit": "frames/sec",
            "vs_baseline": round(mean_fps / 30.0, 3),
            "median": round(float(np.median(fps)), 2),
            "best": round(float(np.max(fps)), 2), "passes": len(fps),
            "chunk": CHUNK,
            "fps_per_pass": [round(f, 2) for f in fps],
            "resident_fps": round(resident, 2),
            "frame_ms": round(1e3 / resident, 2),
            **transport,
            "streaming_model_fps": round(model_fps, 2),
            "streaming_bound": bound,
            "speed_config": speed_cfg}
    roofline = Path(__file__).resolve().parent / "BENCH_ROOFLINE.json"
    if roofline.exists():
        try:
            r = json.loads(roofline.read_text())
            line["stage_ms"] = r.get("stage_ms")
            if r.get("region_ms"):
                line["region_ms"] = r["region_ms"]
            for k in ("decoder_mfu", "overall_mfu", "measured_peak_tflops",
                      "program_gflops_per_frame", "hbm_gb_per_frame",
                      "hbm_roofline_frac", "measured_hbm_gbps"):
                if k in r:
                    line[k] = r[k]
        except Exception:
            pass
    print(json.dumps(line))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--resident", action="store_true",
                    help="measure only the pure-compute (pre-uploaded) rate")
    main(resident_only=ap.parse_args().resident)
