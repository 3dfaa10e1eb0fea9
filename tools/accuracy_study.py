"""Noise-hardened tracker accuracy study (BASELINE configs 2-3 evidence).

Generates ICL-format synthetic sequences -- clean, and sensor-degraded
(uint16 quantization by construction, quadratic depth noise, dropout holes,
2x faster motion) -- and runs full SLAM under BOTH tracker configurations:

* tuned defaults: rgb_stride=2, early-exit tolerances on, bf16 decoder evals
* reference parity: rgb_stride=1, tolerances 0, float32 (reference
  tracker.py:131-283 scheduling/numerics)

Prints a markdown ATE table for the README.

Usage: python tools/accuracy_study.py [--frames 120] [--out /tmp/acc_study]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_slam(data_dir: str, frames: int, parity: bool):
    from difusion_tpu.config import dict_to_args
    from difusion_tpu.core import map as M
    from difusion_tpu.core.tracker import TrackerConfig
    from difusion_tpu.data.production import ICLNUIMSequence
    from difusion_tpu.slam import SLAMSystem

    seq = ICLNUIMSequence(path=data_dir, start_frame=0, end_frame=-1,
                          first_tq=[0, 0, 0, 1, 0, 0, 0], load_gt=True)
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
    if parity:
        targs.rgb_stride = 1
        targs.xi_tol = 0.0
        targs.energy_rel_tol = 0.0
        targs.sdf_compute_dtype = "float32"
    tcfg = TrackerConfig.from_args(targs, point_budget=1 << 13)

    map_cfg = M.MapConfig(bound_min=(-3.5, -3.5, -0.5), n_xyz=(70, 70, 40),
                          voxel_size=0.1, latent_dim=29, capacity=1 << 16,
                          prune_min_vox_obs=16, ignore_count_th=16.0,
                          encoder_count_th=600.0)
    from difusion_tpu.slam import load_prior
    dec, enc, spec = load_prior(
        "/root/reference/pytorch/ckpt/default/hyper.json", 300)
    system = SLAMSystem(map_cfg, tcfg, dec, enc, spec, seq.calib,
                        integrate_interval=20, depth_cut=(0.5, 5.0),
                        meshing=False)
    t0 = time.perf_counter()
    result = system.run_sequence(seq, max_frames=frames)
    dt = time.perf_counter() - t0
    return result.get("ate_rmse", float("nan")), result["n_frames"] / dt


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--out", default="/tmp/acc_study")
    args = parser.parse_args(argv)

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from tools.make_synthetic_icl import main as make_icl

    out = Path(args.out)
    datasets = {
        "clean": dict(motion_scale=0.5),
        "noisy (4mm@1m noise, 2% holes, 2x motion)":
            dict(motion_scale=1.0, noise_sigma=0.004, dropout=0.02, seed=3),
    }
    rows = []
    for name, kw in datasets.items():
        d = out / name.split()[0]
        if not (d / "groundtruth.txt").exists():
            make_icl(str(d), args.frames, **kw)
        for parity in (False, True):
            label = "reference-parity" if parity else "tuned defaults"
            ate, fps = run_slam(str(d), args.frames, parity)
            rows.append((name, label, ate, fps))
            print(f"[{name} / {label}] ate_rmse={ate:.4f} m  {fps:.1f} fps",
                  flush=True)

    print("\n| sequence | tracker config | ATE RMSE (m) | fps |")
    print("|---|---|---|---|")
    for name, label, ate, fps in rows:
        print(f"| {name} | {label} | {ate:.4f} | {fps:.1f} |")
    (out / "results.json").write_text(json.dumps(
        [dict(seq=n, config=l, ate_rmse=a, fps=f) for n, l, a, f in rows],
        indent=2))


if __name__ == "__main__":
    main()
