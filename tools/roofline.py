"""Per-stage device-time / MFU roofline report for the SLAM hot path
(VERDICT round-2 item 4: "is it actually fast, or merely past a modest
target?").

Methodology (each piece chosen to survive the quirks it replaces):

1. **Measured peak**: a large bf16 matmul chain timed on device with a
   SCALAR result (returning the matrix pays a 32 MB tunnel download that
   once made "peak" look like 0.3 TFLOP/s).
2. **Stage budget**: one ``jax.profiler.trace`` of resident chunks.  Only
   LEAF thunk events are summed (``while.*``/``cond.*``/``jit_*``/numeric
   queue groupings are containers -- counting them triple-counted the
   frame), and each fusion is classified by parsing its fused computation
   in the compiled HLO text (trace names are opaque ``fusion.N``).
3. **Decoder MFU**: a standalone microbenchmark of the SDF term's
   vjp-through-decoder at the production batch size, with analytic matmul
   FLOPs from the layer dims (forward ``2 N sum(in*out)`` + the same again
   for the input-cotangent matmuls).  XLA's ``cost_analysis`` counts while
   bodies once and is useless for an iterative tracker.  CAVEAT: on the
   tunneled axon runtime every thunk streams individually, so small
   iterative programs pay per-op overhead a local TPU host would not (a
   131k-point trace shows ~0.11 ms/eval of device matmul time inside a
   2.6 ms wall) -- the reported decoder_mfu is a LOWER bound set by the
   transport, not by the kernels.

Writes BENCH_ROOFLINE.json at the repo root (bench.py merges it into its
one-line output) and prints the table.

Usage: python tools/roofline.py [--chunks 3] [--out BENCH_ROOFLINE.json]
"""
import argparse
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 12

_OP_FAMILIES = (
    ("matmul", ("dot(", "dot-general", "convolution")),
    ("gather", ("gather(",)),
    ("scatter", ("scatter(", "scatter-add", "scatter(")),
    ("sort", ("sort(",)),
    ("stencil", ("reduce-window", "select-and-scatter")),
    ("reduce", ("reduce(",)),
)

_CONTAINER = re.compile(r"^(while|cond|conditional|jit_|\d+$)")
_COPYISH = re.compile(r"^(copy|reshape|transpose|bitcast|broadcast|"
                      r"concatenate|slice|dynamic-slice|dynamic-update|pad|"
                      r"convert|tuple|get-tuple)")


def _family_of_ops(ops) -> str:
    """Op-mnemonic set -> family, hero-op priority order."""
    def has(*prefixes):
        return any(o.startswith(p) for o in ops for p in prefixes)
    if has("dot", "convolution"):
        return "matmul"
    if has("gather"):
        return "gather"
    if has("scatter", "select-and-scatter"):
        return "scatter"
    if has("sort"):
        return "sort"
    if has("reduce-window"):
        return "stencil"
    if has("reduce"):
        return "reduce"
    return "elementwise"


def build_fusion_classifier(hlo_text: str):
    """fusion name -> op family, from the compiled HLO module text.

    Fusion instructions reference their computation via ``calls=``; the
    computation body reveals the hero op (gather / dot / scatter / ...).
    Layout annotations embed parens inside types (``{1,0:T(8,128)}``), so
    the patterns are deliberately loose non-greedy line matches.
    """
    # computation name -> set of op mnemonics appearing inside it
    comp_ops = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
        if m and line.rstrip().endswith("{"):
            cur = m.group(1)
            comp_ops[cur] = set()
            continue
        if cur is not None:
            if line.strip().startswith("}"):
                cur = None
                continue
            m2 = re.search(r"= [^\n]*?\s([a-z][\w\-]*)\(", line)
            if m2:
                comp_ops[cur].add(m2.group(1))

    fusion_family = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?\sfusion\([^\n]*?"
                         r"calls=%([\w.\-]+)", hlo_text):
        name, comp = m.group(1), m.group(2)
        fusion_family[name] = _family_of_ops(comp_ops.get(comp, set()))
    return fusion_family


_REGIONS = (
    ("preprocess", "preprocess_frame"),      # unpack/pyramid/stencil/boxfilter
    ("gn_track", "gauss_newton"),            # the GN iteration loop
    ("integrate", "integrate_keyframe"),     # encoder fusion branch
)


def build_region_classifier(hlo_text: str):
    """instruction name -> pipeline region, from the per-instruction
    ``metadata={op_name="jit(track_fuse_scan)/.../jit(gauss_newton)/..."}``
    annotations in the compiled HLO -- answers "which STAGE of the frame
    is this fusion" where the op-family classifier answers "which KIND of
    op".

    CAVEAT: the profiler reports deduplicated fusion names -- bit-identical
    computations in DIFFERENT regions (e.g. the (8192,) indexer gather that
    appears both in the GN loop's query_sdf and in integrate_keyframe)
    share one event name and attribute all executions to whichever twin
    this map happens to record.  The split is indicative, not exact."""
    region_of = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?metadata=\{[^}]*?"
                         r"op_name=\"([^\"]*)\"", hlo_text):
        name, op_name = m.group(1), m.group(2)
        for region, tag in _REGIONS:
            if tag in op_name:
                region_of[name] = region
                break
        else:
            region_of[name] = "other"
    return region_of


def classify(name: str, dedup: str, fusion_family: dict) -> str:
    base = dedup or name
    if base in fusion_family:
        return fusion_family[base]
    if name in fusion_family:
        return fusion_family[name]
    if _COPYISH.match(name):
        return "copy"
    head = name.split(".")[0]
    for fam, keys in _OP_FAMILIES:
        if any(head == k.rstrip("(").split("-")[0] or head in
               (k.rstrip("("),) for k in keys):
            return fam
    return "elementwise"


def parse_trace(trace_dir: str, fusion_family: dict, region_of: dict = None):
    """Sum LEAF device-event durations (us) by op family (and, when a
    region classifier is given, by pipeline region); containers
    (while/cond/jit/queue groupings) are skipped, so nothing double
    counts."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    by_family = defaultdict(float)
    by_region = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e["name"]
        if _CONTAINER.match(name):
            continue
        dur = float(e.get("args", {}).get("device_duration_ps", 0)) / 1e6 \
            or e.get("dur", 0.0)
        dedup = e.get("args", {}).get("deduplicated_name", "")
        fam = classify(name, dedup, fusion_family)
        by_family[fam] += dur
        total += dur
        if region_of is not None:
            region = region_of.get(dedup or name,
                                   region_of.get(name, "other"))
            by_region[region] += dur
    return dict(by_family), dict(by_region), total


def measured_peak_tflops():
    """Best-case MXU rate: bf16 matmul chain, scalar output (no tunnel
    download in the timed region)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n, k_iter = 4096, 32

    @jax.jit
    def run(a, b):
        def body(c, _):
            return c @ b, None
        c, _ = jax.lax.scan(body, a, None, length=k_iter)
        return jnp.float32(c[0, 0])

    a = (jnp.eye(n, dtype=jnp.bfloat16) * 0.999)
    b = jnp.eye(n, dtype=jnp.bfloat16)
    float(run(a, b))                          # compile + flush
    t0 = time.perf_counter()
    float(run(a, b))
    dt = time.perf_counter() - t0
    return 2.0 * n ** 3 * k_iter / dt / 1e12


def decoder_microbench(system, peak_tflops: float, n_points: int = 8192,
                       k_iter: int = 32):
    """SDF-term decoder vjp at production batch size: ms per evaluation,
    analytic matmul GFLOPs, and fraction of measured peak."""
    import jax
    import jax.numpy as jnp

    from difusion_tpu.models.decoder import decode

    spec = system.spec
    dec = system.dec_params
    ins, outs = spec.layer_dims()
    # forward matmul flops per point + the same again for input cotangents
    flops_pt = 2.0 * sum(i * o for i, o in zip(ins, outs)) * 2.0
    # the std head off the last hidden (128 -> 1) is in layer_dims already
    flops_eval = flops_pt * n_points

    lat = jnp.zeros((n_points, spec.latent_size), jnp.float32)
    xyz = jnp.linspace(-0.5, 0.5, n_points * 3).reshape(n_points, 3)

    @jax.jit
    def run(xyz):
        def body(x, _):
            def f(x):
                sdf, std = decode(dec, spec, lat, x)
                return sdf / jax.lax.stop_gradient(std)
            r, vjp_fn = jax.vjp(f, x)
            (g,) = vjp_fn(jnp.ones_like(r))
            return x + 1e-6 * g, None
        x, _ = jax.lax.scan(body, xyz, None, length=k_iter)
        return jnp.float32(x[0, 0])

    float(run(xyz))
    t0 = time.perf_counter()
    float(run(xyz))
    dt = time.perf_counter() - t0
    ms_per_eval = 1e3 * dt / k_iter
    tflops = flops_eval * k_iter / dt / 1e12
    return {"decoder_eval_ms": round(ms_per_eval, 3),
            "decoder_gflops_per_eval": round(flops_eval / 1e9, 3),
            "decoder_tflops": round(tflops, 2),
            "decoder_mfu": round(tflops / peak_tflops, 3)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BENCH_ROOFLINE.json"))
    ap.add_argument("--trace-dir", default="/tmp/difusion_roofline_trace")
    ap.add_argument("--tiled", action="store_true",
                    help="profile with the block-tiled warp (warp_tiled=True)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import bench as bench_mod

    peak = measured_peak_tflops()
    print(f"measured bf16 matmul peak: {peak:.1f} TFLOP/s", flush=True)

    system, chunks, h, w = bench_mod.build_system(
        n_chunks=args.chunks,
        tcfg_overrides=dict(warp_tiled=True) if args.tiled else None)
    dev_chunks = [jnp.asarray(c) for c in chunks]
    jax.block_until_ready(dev_chunks)
    for c in dev_chunks:                      # warm + flush
        system.process_chunk(c, h, w)
    np.asarray(system.tracker.last_pose.t)

    dec_bench = decoder_microbench(system, peak)
    print(f"decoder microbench: {dec_bench}", flush=True)

    # untraced timing (the profiler inflates wall time on this transport)
    t0 = time.perf_counter()
    for c in dev_chunks:
        system.process_chunk(c, h, w)
    np.asarray(system.tracker.last_pose.t)
    n_frames = args.chunks * CHUNK
    frame_ms = 1e3 * (time.perf_counter() - t0) / n_frames

    # fusion classifier from the compiled scan program
    fusion_family = {}
    region_of = {}
    try:
        from difusion_tpu import slam as slam_mod
        tr = system.tracker
        lowered = slam_mod.track_fuse_scan.lower(
            tr.tcfg, system.map_cfg, system.spec, tr.calib,
            system.dec_params, system.enc_params, system.state,
            tr.last_pose.R, tr.last_pose.t, tr.last_pyramid, tr.rgb_weight,
            tr.n_unstable, tr.last_delta.R, tr.last_delta.t, dev_chunks[0],
            jnp.ones(CHUNK, bool), h, w)
        hlo_text = lowered.compile().as_text()
        fusion_family = build_fusion_classifier(hlo_text)
        region_of = build_region_classifier(hlo_text)
        print(f"classified {len(fusion_family)} fusions from HLO", flush=True)
    except Exception as e:
        print(f"HLO classification unavailable: {e}", flush=True)

    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)   # only THIS run's trace
    with jax.profiler.trace(args.trace_dir):
        for c in dev_chunks:
            system.process_chunk(c, h, w)
        np.asarray(system.tracker.last_pose.t)

    fam_us, region_us, total_us = parse_trace(args.trace_dir, fusion_family,
                                              region_of)
    stage_ms = {k: round(v / 1e3 / n_frames, 3)
                for k, v in sorted(fam_us.items(), key=lambda kv: -kv[1])}
    region_ms = {k: round(v / 1e3 / n_frames, 3)
                 for k, v in sorted(region_us.items(), key=lambda kv: -kv[1])}
    device_ms = total_us / 1e3 / n_frames

    out = {
        "frame_ms": round(frame_ms, 2),
        "device_ms_per_frame": round(device_ms, 2),
        "stage_ms": stage_ms,
        "region_ms": region_ms,
        "measured_peak_tflops": round(peak, 1),
        **dec_bench,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
