"""Noise-hardened tracker + mapping accuracy study (BASELINE configs 2-3
evidence; VERDICT round-2 items 1, 2 and 9).

Sequences (ICL-format on disk, decoded through the full production path):

* ``drift`` (120 fr): forward wander over fresh surface -- clean and
  sensor-degraded (uint16 quantization by construction, quadratic depth
  noise, dropout holes, 2x faster motion).
* ``loop`` (300 fr): closed circuit whose final ~20% re-enters territory
  mapped at the start -- tracking against an OLD map, the SLAM failure mode
  forward drift never exercises; clean and degraded.

Per sequence, the tracker configurations that run by default:

* defaults: reference numerics (rgb stride 1, f32 decoder evals) with
  early-exit tolerances on
* parity: reference tracker.py:131-283 SCHEDULING exactly (tolerances 0,
  per-pixel warp); keeps the better-tracking bilinear warp + per-level K
* parity_strict: literal reference warp NUMERICS on top of parity --
  round-to-nearest reprojection (photometric.cu:44-55) and full-res K at
  every pyramid level (tracker.py:133-136)
* speed: the SHIPPED speed preset -- rgb_stride=[1, 2, 2] (L0 stays dense;
  the block-tiled bf16 texture makes full-res L0 as cheap as strided) +
  bf16 decoder evals (f32 final group)

and each run reports ATE, throughput, and the quantitative mesh error
against the analytic surface (difusion_tpu.data.production.mesh_error_stats)
from a final full extract.

A separate mapping-only A/B (GT poses, fusion identical) isolates the value
of latent optimization (reference map.py:459-513 + OptimizeProcess): mesh
error with ``latent_optimize`` on vs off.

Writes <out>/results.json and prints markdown tables for the README.

Usage: python tools/accuracy_study.py [--frames 120] [--loop-frames 300]
       [--out /tmp/acc_study] [--skip-optimize-ab]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

HYPER = "/root/reference/pytorch/ckpt/default/hyper.json"


def _tracking_args(variant: str = "default"):
    from difusion_tpu.config import dict_to_args
    tracking = {
        "iter_config": [
            {"n": 10, "type": [["rgb", 2]]},
            {"n": 10, "type": [["sdf"], ["rgb", 1]]},
            {"n": 50, "type": [["sdf"], ["rgb", 0]]},
        ],
        "sdf": {"robust_kernel": "huber", "robust_k": 5.0, "subsample": 0.5},
        "rgb": {"weight": 500.0, "robust_kernel": None, "robust_k": 0.01,
                "min_grad_scale": 0.0, "max_depth_delta": 0.2},
    }
    targs = dict_to_args(tracking)
    if variant == "parity":      # exact reference scheduling + per-pixel warp
        targs.xi_tol = 0.0       # (defaults are already stride-1 f32)
        targs.energy_rel_tol = 0.0
        targs.warp_tiled = False
    elif variant == "parity_strict":
        # parity + literal reference warp numerics: round-to-nearest
        # reprojection (photometric.cu:44-55) and full-res K at all levels
        # (tracker.py:133-136)
        targs.xi_tol = 0.0
        targs.energy_rel_tol = 0.0
        targs.warp_tiled = False
        targs.rgb_bilinear = False
        targs.rgb_fullres_K = True
    elif variant == "speed":
        # the SHIPPED preset: L0 stays stride 1 (the block-tiled bf16
        # texture makes full-res L0 as cheap as strided) -- only the coarse
        # levels stride, plus bf16 decoder evals (f32 final group)
        targs.rgb_stride = [1, 2, 2]
        targs.sdf_compute_dtype = "bfloat16"
    elif variant == "packed":    # default scheduling, per-pixel warp texture
        targs.warp_tiled = False
    elif variant == "compensated":
        # default scheduling + order-robust GN numerics: pairwise-TwoSum
        # H/g accumulation and one iterative-refinement solve step -- the
        # TPU counterpart of the reference's float64 host solve
        # (reference tracker.py:272); core/tracker.solve_dtype docstring
        targs.solve_dtype = "compensated"
    elif variant == "blocked":
        # order-robust GN numerics at plain-einsum cost: MXU per-block
        # partial Grams + compensated cross-block combine
        # (ops/compsum.gram_blocked)
        targs.solve_dtype = "blocked"
    elif variant.startswith("perturbed"):
        # deliberate reduction-order perturbation (fixed point-set
        # permutation; seed after the dash, e.g. "perturbed-7").  Pair with
        # the same seed on "perturbed_comp-7" to measure how much of the
        # cross-version loop300 sensitivity band compensated accumulation
        # removes.
        seed = int(variant.split("-")[1]) if "-" in variant else 7
        targs.perturb_points = seed
        if variant.startswith("perturbed_comp"):
            targs.solve_dtype = "compensated"
        elif variant.startswith("perturbed_blk"):
            targs.solve_dtype = "blocked"
    else:   # default = early exits + block-tiled warp (TrackerConfig defaults)
        assert variant == "default", variant
    return targs


def _map_cfg(encoder_count_th=600.0):
    from difusion_tpu.core import map as M
    return M.MapConfig(bound_min=(-3.5, -3.5, -0.5), n_xyz=(70, 70, 40),
                       voxel_size=0.1, latent_dim=29, capacity=1 << 16,
                       prune_min_vox_obs=16, ignore_count_th=16.0,
                       encoder_count_th=encoder_count_th)


def run_slam(data_dir: str, frames: int, variant: str, chunk: int = 12,
             mesh: bool = True, hyper: str = HYPER, epoch: int = 300):
    """Full SLAM over an on-disk ICL-format sequence; returns a result dict
    with ate_rmse, fps, and mesh error stats from one final full extract.
    ``hyper``/``epoch`` select the prior (default: the reference's shipped
    checkpoint; pass a trainer save_dir's hyper.json for a self-trained
    prior, BASELINE config 5 downstream evidence)."""
    from difusion_tpu.core.tracker import TrackerConfig
    from difusion_tpu.data.production import ICLNUIMSequence, mesh_error_stats
    from difusion_tpu.slam import SLAMSystem, load_prior

    seq = ICLNUIMSequence(path=data_dir, start_frame=0, end_frame=-1,
                          first_tq=[0, 0, 0, 1, 0, 0, 0], load_gt=True)
    tcfg = TrackerConfig.from_args(_tracking_args(variant),
                                   point_budget=1 << 13)
    dec, enc, spec = load_prior(hyper, epoch)
    system = SLAMSystem(_map_cfg(), tcfg, dec, enc, spec, seq.calib,
                        integrate_interval=20, depth_cut=(0.5, 5.0),
                        meshing=mesh, meshing_interval=10 ** 9,
                        mesh_resolution=4)
    t0 = time.perf_counter()
    result = system.run_sequence(seq, max_frames=frames, chunk=chunk)
    dt = time.perf_counter() - t0
    out = {"ate_rmse": result.get("ate_rmse", float("nan")),
           "fps": result["n_frames"] / dt,
           "n_voxels": result["n_voxels"]}
    if mesh:
        system.state = system.mesher.extract(system.state, max_std=0.25,
                                             no_cache=True)
        out.update(mesh_error_stats(system.mesher.triangles()[0]))
    return out


def run_mapping_only(frames: int, latent_optimize: bool):
    """Mapping-only A/B (GT poses; isolates latent optimization's effect on
    map quality).  Runs straight from the renderer -- no tracking, so the
    production decode path adds nothing here."""
    from difusion_tpu.core import map as M
    from difusion_tpu.core.tracker import TrackerConfig
    from difusion_tpu.data import SyntheticSequence
    from difusion_tpu.data.production import ICLNUIMSequence, mesh_error_stats
    from difusion_tpu.slam import SLAMSystem, load_prior

    seq = SyntheticSequence(n_frames=frames, h=480, w=640,
                            calib=ICLNUIMSequence.CALIB, corrugation=0.1,
                            motion_scale=0.5)
    dec, enc, spec = load_prior(HYPER, 300)
    # lower convergence threshold so voxels reach the optimizable state
    # within the sequence; identical for both arms, so the A/B is fair
    system = SLAMSystem(_map_cfg(encoder_count_th=200.0),
                        TrackerConfig.from_args(_tracking_args("default"),
                                                point_budget=1 << 13),
                        dec, enc, spec, seq.calib,
                        integrate_interval=10, depth_cut=(0.5, 5.0),
                        meshing=True, meshing_interval=10 ** 9,
                        mesh_resolution=4, latent_optimize=latent_optimize,
                        latent_optimize_mode="sync", optim_n_iters=20)
    system.use_gt_poses = True
    result = system.run_sequence(seq, max_frames=frames)
    system.state = system.mesher.extract(system.state, max_std=0.25,
                                         no_cache=True)
    out = mesh_error_stats(system.mesher.triangles()[0])
    out["n_voxels"] = result["n_voxels"]
    out["opt_overflow"] = result["opt_overflow"]
    return out


def run_scannet_long(frames: int = 300, chunk: int = 10):
    """Long-horizon ScanNet-format run (BASELINE config 4 at study scale,
    round-3 verdict item 9): hash-indexed map, incremental meshing ON at the
    integrate cadence, chunked dispatch.  Records ATE, the capacity-pressure
    overflow counters, and per-extract host transfer bytes (the incremental
    mesher's ``last_transfer_bytes``)."""
    from difusion_tpu.core import hash_map as HM
    from difusion_tpu.core.tracker import TrackerConfig
    from difusion_tpu.data.production import ScanNetSequence, mesh_error_stats
    from difusion_tpu.slam import SLAMSystem, load_prior

    d = Path("/tmp/acc_study") / f"scannet{frames}"
    if not (d / "intrinsic" / "intrinsic_depth.txt").exists():
        from tools.make_synthetic_scannet import main as make_scannet
        make_scannet(str(d), frames)
    seq = ScanNetSequence(path=str(d), load_gt=True)

    dec, enc, spec = load_prior(HYPER, 300)
    map_cfg = HM.HashMapConfig(voxel_size=0.1, latent_dim=29,
                               capacity=1 << 16, table_size=1 << 18,
                               prune_min_vox_obs=16, ignore_count_th=16.0,
                               encoder_count_th=600.0)
    system = SLAMSystem(map_cfg,
                        TrackerConfig.from_args(_tracking_args("default"),
                                                point_budget=1 << 13),
                        dec, enc, spec, seq.calib,
                        integrate_interval=20, depth_cut=(0.3, 6.0),
                        meshing=True, meshing_interval=20, mesh_resolution=4)
    transfer_bytes = []
    inner_extract = system.mesher.extract

    def recording_extract(state, max_std=0.15, **kw):
        out = inner_extract(state, max_std=max_std, **kw)
        transfer_bytes.append(int(system.mesher.last_transfer_bytes))
        return out

    system.mesher.extract = recording_extract
    t0 = time.perf_counter()
    result = system.run_sequence(seq, max_frames=frames, chunk=chunk)
    dt = time.perf_counter() - t0

    out = {"seq": f"scannet{frames}-synth", "config": "default+hash",
           "ate_rmse": result.get("ate_rmse", float("nan")),
           "fps": result["n_frames"] / dt,
           "n_voxels": result["n_voxels"],
           "alloc_overflow": result["alloc_overflow"],
           "opt_overflow": result["opt_overflow"],
           "n_extracts": len(transfer_bytes),
           "extract_transfer_bytes_mean": (float(np.mean(transfer_bytes))
                                           if transfer_bytes else 0.0),
           "extract_transfer_bytes_max": (int(np.max(transfer_bytes))
                                          if transfer_bytes else 0)}
    system.mesher.extract = inner_extract
    system.state = system.mesher.extract(system.state, max_std=0.25,
                                         no_cache=True)
    out.update(mesh_error_stats(system.mesher.triangles()[0]))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--loop-frames", type=int, default=300)
    parser.add_argument("--out", default="/tmp/acc_study")
    parser.add_argument("--skip-optimize-ab", action="store_true")
    parser.add_argument("--scannet", type=int, default=0,
                        help="ALSO run the long-horizon ScanNet-format row "
                             "with this many frames (hash map, incremental "
                             "meshing, chunked)")
    parser.add_argument("--hyper", default=HYPER,
                        help="prior checkpoint hyper.json (a trainer "
                             "save_dir for a self-trained prior)")
    parser.add_argument("--epoch", type=int, default=300)
    parser.add_argument("--tag", default="",
                        help="suffix appended to config labels in the rows "
                             "(e.g. '+self-prior')")
    parser.add_argument("--only", default="",
                        help="substring filter on sequence names")
    parser.add_argument("--variants",
                        default="default,parity,parity_strict,speed",
                        help="comma list of tracker configs to run")
    args = parser.parse_args(argv)

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from tools.make_synthetic_icl import main as make_icl

    out = Path(args.out)
    noisy = dict(noise_sigma=0.004, dropout=0.02, seed=3)
    datasets = {
        "drift-clean": dict(n_frames=args.frames, motion_scale=0.5),
        "drift-noisy(4mm@1m,2%holes,2x)": dict(n_frames=args.frames,
                                               motion_scale=1.0, **noisy),
        "loop300-clean": dict(n_frames=args.loop_frames, motion_scale=1.2,
                              trajectory="loop"),
        "loop300-noisy": dict(n_frames=args.loop_frames, motion_scale=1.2,
                              trajectory="loop", **noisy),
    }
    # resume journal with invalidation: a meta first-line records the study
    # parameters (and the code revision, advisory).  A journal written with
    # different frame counts is measurement-incompatible and is rotated
    # aside, not reused; a code-revision mismatch only WARNS, because
    # intentionally reusing rows across numerics-neutral code changes is
    # the normal cross-stage workflow (the caller decides by deleting the
    # journal when the change is not neutral).
    import subprocess
    try:
        git_rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=str(REPO_ROOT)).stdout.strip()
    except OSError:
        git_rev = ""
    study_params = {"frames": args.frames, "loop_frames": args.loop_frames,
                    "hyper": args.hyper, "epoch": args.epoch}
    rows = []
    partial = out / "results.partial.jsonl"
    if partial.exists():
        lines = partial.read_text().splitlines()
        meta = None
        for line in lines:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "_study_params" in d:
                meta = d
                continue
            rows.append(d)
        if meta is None or meta["_study_params"] != study_params:
            stale = partial.with_suffix(".jsonl.stale")
            partial.rename(stale)
            print(f"[resume] journal params mismatch "
                  f"({None if meta is None else meta['_study_params']} != "
                  f"{study_params}) -- rotated to {stale.name}, starting "
                  "fresh", flush=True)
            rows = []
        else:
            if meta.get("_git") and git_rev and meta["_git"] != git_rev:
                print(f"[resume] WARNING: journal written at code rev "
                      f"{meta['_git']}, now {git_rev}; reusing rows anyway "
                      "-- delete the journal if the change was not "
                      "numerics-neutral", flush=True)
            if rows:
                print(f"[resume] {len(rows)} finished rows from {partial}",
                      flush=True)
    if not partial.exists():
        out.mkdir(parents=True, exist_ok=True)
        with partial.open("w") as f:
            f.write(json.dumps({"_study_params": study_params,
                                "_git": git_rev}) + "\n")
    for name, kw in datasets.items():
        if args.only and args.only not in name:
            continue
        d = out / name.split("(")[0]
        n = kw["n_frames"]
        if not (d / "groundtruth.txt").exists():
            make_icl(str(d), **kw)
        for label in args.variants.split(","):
            done = {(r["seq"], r["config"]) for r in rows}
            if (name, label + args.tag) in done:
                continue
            r = run_slam(str(d), n, label, hyper=args.hyper,
                         epoch=args.epoch)
            r.update(seq=name, config=label + args.tag)
            rows.append(r)
            # crash-resilient partial record: a lost tunnel mid-matrix must
            # not cost the finished rows (reloaded above on rerun)
            out.mkdir(parents=True, exist_ok=True)
            with (out / "results.partial.jsonl").open("a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"[{name} / {label}] ate_rmse={r['ate_rmse']:.4f} m  "
                  f"mesh_err={r.get('mesh_err_mean', float('nan')):.4f} m  "
                  f"{r['fps']:.1f} fps", flush=True)

    prior_results = {}
    if (out / "results.json").exists():   # reuse gated on identical params below
        try:
            prior_results = json.loads((out / "results.json").read_text())
        except json.JSONDecodeError:
            pass

    if prior_results.get("study_params") != study_params:
        prior_results = {}    # different frames/prior: do not reuse anything

    scannet = None
    if args.scannet > 0 and prior_results.get("scannet_long"):
        scannet = prior_results["scannet_long"]
        print("[resume] reusing scannet_long row", flush=True)
    elif args.scannet > 0:
        scannet = run_scannet_long(args.scannet)
        print(f"[{scannet['seq']}] ate_rmse={scannet['ate_rmse']:.4f} m  "
              f"mesh_err={scannet.get('mesh_err_mean', float('nan')):.4f} m  "
              f"{scannet['fps']:.1f} fps  "
              f"alloc_overflow={scannet['alloc_overflow']} "
              f"opt_overflow={scannet['opt_overflow']}  "
              f"extract transfer mean "
              f"{scannet['extract_transfer_bytes_mean'] / 1e6:.2f} MB "
              f"(max {scannet['extract_transfer_bytes_max'] / 1e6:.2f})",
              flush=True)

    ab = []
    if prior_results.get("mapping_only_ab"):
        ab = prior_results["mapping_only_ab"]
        print("[resume] reusing mapping_only_ab rows", flush=True)
    elif not args.skip_optimize_ab and not args.only:
        for opt in (False, True):
            r = run_mapping_only(args.frames, opt)
            r["latent_optimize"] = opt
            ab.append(r)
            print(f"[mapping-only / latent_optimize={opt}] "
                  f"mesh_err={r['mesh_err_mean']:.4f} m "
                  f"(p95 {r['mesh_err_p95']:.4f})", flush=True)

    print("\n| sequence | tracker config | ATE RMSE (m) | mesh err mean (m) "
          "| mesh err p95 (m) | fps |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['seq']} | {r['config']} | {r['ate_rmse']:.4f} | "
              f"{r.get('mesh_err_mean', float('nan')):.4f} | "
              f"{r.get('mesh_err_p95', float('nan')):.4f} | {r['fps']:.1f} |")
    if ab:
        print("\n| mapping-only (GT poses) | mesh err mean (m) | p95 (m) |")
        print("|---|---|---|")
        for r in ab:
            lab = "latent_optimize on" if r["latent_optimize"] else "fusion only"
            print(f"| {lab} | {r['mesh_err_mean']:.4f} | {r['mesh_err_p95']:.4f} |")

    out.mkdir(parents=True, exist_ok=True)
    payload = {"slam": rows, "mapping_only_ab": ab,
               "study_params": study_params}
    if scannet is not None:
        payload["scannet_long"] = scannet
    (out / "results.json").write_text(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
