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
# denominator benches repeat N times, best kept: the round-3 advisor flagged
# an unexplained 5% peak drop between artifacts -- single-shot peaks are
# hostage to box contention; the best of N is the hardware number
_PEAK_REPEATS = 3

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


# -- execution-weighted FLOP / HBM-byte accounting ---------------------------
#
# XLA's cost_analysis counts while-loop bodies ONCE, which is useless for a
# tracker whose GN loop iterates a data-dependent ~10-70 times.  Instead:
# parse per-INSTRUCTION flops/bytes from the compiled HLO text, then weight
# by actual execution counts from the profiler trace (every fusion execution
# is its own event) -- measured, loop-exact whole-program arithmetic.

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s64": 8,
                "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
                "f64": 8, "c64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^{}]*)\})?")


def _member_info(dt, dims, layout):
    """(hbm_bytes, raw_bytes) of one 'dtype[dims]{layout}' member.
    hbm_bytes is 0 when the layout's memory-space annotation places the
    buffer OFF HBM -- compiled TPU HLO marks VMEM-resident buffers `S(1)`
    (alternate memory space; the memory-space-assignment pass parks hot
    working sets there) and SMEM-resident scalars `S(2)`.  Unannotated =
    default space = HBM.  raw_bytes is the space-blind size (the touched
    region of a windowed read is raw-sized regardless of where the window
    lands)."""
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    raw = n * _DTYPE_BYTES.get(dt, 4)
    sp = re.search(r"S\((\d+)\)", layout or "")
    if sp and sp.group(1) != "0":
        return 0, raw
    return raw, raw


def _shape_info(type_str):
    """'f32[8192,128]{...}' -> (dims tuple, HBM bytes, raw bytes).  Tuple
    types '(f32[..]{..}, u8[..]{..})' (multi-output fusions, while carries,
    async-start wrappers) sum member bytes; the reported dims are the first
    member's.  HBM bytes exclude non-HBM-space members (see
    :func:`_member_info`); raw bytes count every member."""
    members = _SHAPE_RE.findall(type_str)
    if not members:
        return (), 0, 0
    if type_str.startswith("("):
        shape = tuple(int(d) for d in members[0][1].split(",") if d)
        hb = rb = 0
        for mm in members:
            h, r = _member_info(*mm)
            hb += h
            rb += r
        return shape, hb, rb
    m = _SHAPE_RE.match(type_str)
    if not m:
        return (), 0, 0
    dt, dims, layout = m.group(1), m.group(2), m.group(3)
    shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
    h, r = _member_info(dt, dims, layout)
    return shape, h, r


def _conv_flops(line: str, out_shape, shape_of) -> float:
    """FLOPs of one HLO convolution line (TPU lowers ALL dots to
    convolutions -- plain matmuls carry ``dim_labels=bf_io->bf`` and no
    window): 2 * prod(output) * lhs_feature_dim * prod(window sizes).
    Operands are bare %names; ``shape_of`` resolves them."""
    ops = _call_operands(line, "convolution")
    lhs_shape = shape_of.get(ops[0], ((), 0, 0))[0] if ops else ()
    win = 1
    mw = re.search(r"window=\{size=([\dx]+)", line)
    if mw:
        for d in mw.group(1).split("x"):
            win *= int(d)
    feat = 1
    md = re.search(r"dim_labels=(\w+)_", line)
    if md and "f" in md.group(1):
        fi = md.group(1).index("f")
        feat = lhs_shape[fi] if fi < len(lhs_shape) else 1
    out = 1
    for d in out_shape:
        out *= d
    return 2.0 * out * win * feat


def _call_operands(line: str, op: str):
    """%operand names inside ``op(...)`` on this line."""
    m = re.search(re.escape(op) + r"\(([^)]*)\)", line)
    if not m:
        return []
    return re.findall(r"%([\w.\-]+)", m.group(1))


def _decoder_row_flops(fwd_only: bool) -> float:
    """Analytic matmul FLOPs per input row of the fused Pallas decoder
    kernels (ops/decoder_fused: forward 6 dots; the grad kernel adds 3
    128x128 backward dots + 2 128x3 input-gradient dots)."""
    din = 32
    fwd = 2.0 * (din * 128 + 128 * 128 + 128 * 128
                 + 128 * 128 + din * 128 + 128 * 8)
    if fwd_only:
        return fwd
    bwd = 2.0 * (3 * 128 * 128 + 2 * 128 * 3)
    return fwd + bwd


def build_fusion_costs(hlo_text: str):
    """instruction/fusion name -> (flops, hbm_bytes) per execution.

    Compiled TPU HLO prints operands as bare ``%names`` (no inline types)
    and lowers every dot to a ``convolution`` (matmuls carry
    ``dim_labels=bf_io->bf`` and no window), so this runs in two passes:

    1. map every instruction name to its RESULT shape/bytes;
    2. walk computations summing convolution FLOPs (operand shapes via the
       map), then price each top-level instruction: fusion = its called
       computation's FLOPs; convolution = its own; pallas custom-call (the
       fused decoder) = analytic FLOPs per input row (weights stay in
       VMEM).

    Bytes are MEMORY-SPACE AWARE: on compiled TPU HLO the memory-space-
    assignment pass parks most hot buffers in VMEM (``S(1)`` layout
    annotations) and stages them with async ``copy-start/-done`` /
    ``slice-start/-done`` pairs, so the real HBM traffic splits between
    (a) fusions whose params/outputs stayed HBM-resident -- priced by
    :func:`_fusion_bytes` (body dataflow: in-place DUS carries and
    windowed dynamic-slice/gather reads count only touched bytes) -- and
    (b) the staging transfers themselves -- priced by
    :func:`_generic_bytes` on the ``*-done`` instruction (where the
    profiler charges the time), reads/writes counted only on the HBM side
    of the move.  Bare convolutions/custom-calls stream full HBM-resident
    operands + result.
    """
    lines = hlo_text.splitlines()
    shape_of = {}
    # tuple result types contain nested parens (layout tiles like T(8,128)),
    # so the tuple alternative must balance one nesting level
    _TUPLE = r"\((?:[^()]|\([^()]*\))*\)"
    for line in lines:
        m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = (" + _TUPLE + r"|\S+)",
                     line)
        if m:
            shape_of[m.group(1)] = _shape_info(m.group(2))

    # computation bodies: conv flops + instruction graph (op, operands) for
    # the dataflow byte pricing below (headers end with "{")
    comp_flops = {}
    comp_insts = {}      # comp -> {inst name: (op, [operand names])}
    comp_params = {}     # comp -> [param names in index order]
    comp_root = {}       # comp -> root inst name
    cur = None
    for line in lines:
        m = re.match(r"\s*%?([\w.\-]+)\s+\(", line)
        if m and line.rstrip().endswith("{") and "->" in line:
            cur = m.group(1)
            comp_flops[cur] = 0.0
            comp_insts[cur] = {}
            comp_params[cur] = []
            continue
        if cur is not None:
            if line.strip().startswith("}"):
                cur = None
                continue
            mi = re.match(r"\s*(ROOT )?%([\w.\-]+) = "
                          r"(?:\((?:[^()]|\([^()]*\))*\)|\S+)"
                          r"\s+([a-z][\w\-]*)\(", line)
            if not mi:
                continue
            name, op = mi.group(2), mi.group(3)
            comp_insts[cur][name] = (op, _call_operands(line, op))
            if mi.group(1):
                comp_root[cur] = name
            if op == "parameter":
                mp = re.search(r"parameter\((\d+)\)", line)
                if mp:
                    idx = int(mp.group(1))
                    ps = comp_params[cur]
                    ps.extend([None] * (idx + 1 - len(ps)))
                    ps[idx] = name
            elif op == "convolution":
                comp_flops[cur] += _conv_flops(line, shape_of[name][0],
                                               shape_of)

    costs = {}
    for line in lines:
        # result type may be a tuple (multi-output fusion) -- a plain \S+
        # cannot span its internal spaces and would skip the instruction
        m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = "
                     r"(\((?:[^()]|\([^()]*\))*\)|\S+)"
                     r"\s+([a-z][\w\-]*)\(", line)
        if not m:
            continue
        name, res_type, op = m.group(1), m.group(2), m.group(3)
        out_shape, out_b, out_raw = shape_of.get(name, ((), 0, 0))
        fl = 0.0
        if op == "fusion":
            mc = re.search(r"calls=%?([\w.\-]+)", line)
            if not mc:
                continue
            fl = comp_flops.get(mc.group(1), 0.0)
            b = _fusion_bytes(mc.group(1), _call_operands(line, op),
                              res_type, comp_insts, comp_params,
                              comp_root, shape_of)
        elif op == "convolution":
            fl = _conv_flops(line, out_shape, shape_of)
            b = out_b + sum(_bytes_of(o, shape_of)
                            for o in _call_operands(line, op))
        elif op == "custom-call" and "tpu_custom_call" in line:
            # fused decoder kernels: first operand is the (N, din) input.
            # The lowered line carries no kernel name, only the pallas_call
            # site's source_file -- the grad kernel's only call site is the
            # tracker, the forward kernel's the mesher/decode paths
            ops = _call_operands(line, "custom-call")
            rows = shape_of.get(ops[0], ((0,), 0, 0))[0][0] if ops else 0
            fl = rows * _decoder_row_flops(
                fwd_only="tracker.py" not in line)
            b = out_b + sum(_bytes_of(o, shape_of) for o in ops)
        else:
            b = _generic_bytes(op, _call_operands(line, op), shape_of,
                               out_b, out_raw)
            if b is None:
                continue
        costs[name] = (fl, b)
    return costs


_SKIP_OPS = frozenset((
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "iota", "partition-id", "replica-id", "custom-call",
    "while", "conditional", "call", "fusion", "convolution",
    "rng-bit-generator", "infeed", "outfeed"))


def _generic_bytes(op, ops, shape_of, out_b, out_raw):
    """HBM bytes of one top-level NON-fusion instruction execution, or
    ``None`` for ops that move no data themselves (metadata ops; ``*-start``
    halves of async pairs, whose traffic is charged on the ``*-done`` the
    profiler reports the time on).

    ``*-done`` (async copy/slice prefetches inserted by memory-space
    assignment): the moved region is the done-result's raw size; it is an
    HBM READ iff the start tuple holds HBM bytes beyond the destination
    member (i.e. the source side lives in HBM) and an HBM WRITE iff the
    destination itself does.  This one rule prices all four space
    combinations of both tuple conventions -- ``copy-start`` = ``(dest,
    src, ctx)``, generic ``async-start`` = ``((operands), dest, ctx)`` --
    without knowing which member is which.

    ``slice``/``dynamic-slice`` read only the touched (result-raw-sized)
    region of an HBM source; ``dynamic-update-slice`` reads its update and
    rewrites only the update region of an HBM destination (XLA aliases the
    rest in place).  Everything else (sync copy relayouts, sort, reduce,
    reduce-window, concatenate, ...) streams HBM-resident operands +
    result."""
    if op in _SKIP_OPS or op.endswith("-start"):
        return None
    if op.endswith("-done"):
        start_hbm = _bytes_of(ops[0], shape_of) if ops else 0
        read = out_raw if start_hbm - out_b > 0 else 0
        return read + out_b
    if op in ("slice", "dynamic-slice"):
        read = out_raw if (ops and _bytes_of(ops[0], shape_of) > 0) else 0
        return out_b + read
    if op == "dynamic-update-slice":
        if len(ops) < 2:
            return out_b
        upd_raw = _raw_of(ops[1], shape_of)
        w = upd_raw if out_b > 0 else 0
        r = upd_raw if _bytes_of(ops[1], shape_of) > 0 else 0
        return w + r
    return out_b + sum(_bytes_of(o, shape_of) for o in ops)


def _bytes_of(name, shape_of):
    return shape_of.get(name, ((), 0, 0))[1]


def _raw_of(name, shape_of):
    return shape_of.get(name, ((), 0, 0))[2]


def _fusion_bytes(comp, call_ops, res_type, comp_insts, comp_params,
                  comp_root, shape_of):
    """HBM bytes one execution of a fusion streams, modeled from its body's
    dataflow (still an upper bound, but space/aliasing/touch aware).
    Memory spaces are read from the CALL SITE -- the fusion's result-type
    members and its operands' own result types carry the buffer-assignment
    ``S(1)`` annotations; body intermediates are unannotated and would
    misprice a VMEM-resident fusion as HBM traffic.

    writes: each result member (tuple members matched 1:1 with the body
      root's operands) counts its member HBM bytes -- EXCEPT a
      ``dynamic-update-slice`` member, which writes only its update slice
      (XLA updates loop carries in place; the untouched region is never
      rewritten).
    reads: each parameter counts once, gated on the matching call operand's
      space: full bytes if any body use consumes it wholesale; only the
      touched bytes when every use is windowed -- ``dynamic-slice`` reads
      its result size, ``gather`` on the table reads ~result-size rows, and
      a ``dynamic-update-slice`` DESTINATION (operand 0) reads nothing
      (in-place alias).  Without this, a while-loop carry fusion would be
      priced as streaming whole pyramids every GN iteration -- the implied
      bandwidth exceeded the measured peak 7x.
    """
    insts = comp_insts.get(comp, {})
    root = comp_root.get(comp)

    def canon(n):
        seen = 0
        while n in insts and insts[n][0] in ("bitcast", "copy") and \
                insts[n][1] and seen < 10:
            n = insts[n][1][0]
            seen += 1
        return n

    # result members: spaces from the call-site type, ops from the body root
    out_members = _SHAPE_RE.findall(res_type)
    body_members = []
    if root is not None:
        r_op, r_ops = insts[root]
        body_members = [canon(o) for o in r_ops] if r_op == "tuple" else \
            [canon(root)]
    w = 0
    for i, mm in enumerate(out_members):
        m_hbm, _ = _member_info(*mm)
        if m_hbm == 0:
            continue
        m_op = insts.get(body_members[i], ("", []))[0] \
            if i < len(body_members) else ""
        if m_op == "dynamic-update-slice":
            w += _raw_of(insts[body_members[i]][1][1], shape_of)  # update
        else:
            w += m_hbm

    r = 0
    for p, co in zip(comp_params.get(comp, []), call_ops):
        if p is None:
            continue
        pb = _bytes_of(co, shape_of)     # call operand's space is definitive
        if pb == 0:                      # VMEM/SMEM-resident: no HBM reads
            continue
        partial = 0
        full = False
        for iname, (iop, iops) in insts.items():
            cops = [canon(o) for o in iops]
            if p not in cops:
                continue
            if iop == "dynamic-slice" and cops[0] == p:
                partial += _raw_of(iname, shape_of)
            elif iop == "gather" and cops and cops[0] == p:
                partial += _raw_of(iname, shape_of)
            elif iop == "dynamic-update-slice" and cops[0] == p and \
                    (p not in cops[1:]):
                pass                      # in-place destination, not read
            else:
                full = True
                break
        r += pb if full else min(partial, pb)
    return w + r


def measured_hbm_gbps():
    """Peak HBM bandwidth via a big streaming elementwise pass (read+write
    2 x 1 GB per iteration, 24 iterations, scalar output).  Sized so ~48 GB
    of traffic dwarfs the tunnel's per-thunk dispatch overhead -- a 256 MB
    x8 version measured 122 GB/s (overhead-dominated); this one measures
    the stable streaming rate."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024         # 1 GB f32
    k_iter = 24

    @jax.jit
    def run(x):
        def body(c, _):
            return c * 1.0000001 + 1.0, None
        c, _ = jax.lax.scan(body, x, None, length=k_iter)
        return c[0]

    x = jnp.ones((n,), jnp.float32)
    float(run(x))
    best = float("inf")
    for _ in range(_PEAK_REPEATS):      # best-of-N: contention only slows
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return 2.0 * 4.0 * n * k_iter / best / 1e9


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


def parse_trace(trace_dir: str, fusion_family: dict, region_of: dict = None,
                costs: dict = None):
    """Sum LEAF device-event durations (us) by op family (and, when a
    region classifier is given, by pipeline region); containers
    (while/cond/jit/queue groupings) are skipped, so nothing double
    counts.  With ``costs`` (from :func:`build_fusion_costs`), also
    accumulates execution-weighted program FLOPs and HBM bytes -- each
    while-loop iteration is its own trace event, so loop trip counts are
    measured, not guessed."""
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
    by_name = defaultdict(float)
    bytes_by_family = defaultdict(float)
    n_exec = defaultdict(int)
    total = 0.0
    flops = 0.0
    hbm_bytes = 0.0
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
        by_name[dedup or name] += dur
        n_exec[dedup or name] += 1
        total += dur
        if costs is not None:
            fl, b = costs.get(dedup or name, costs.get(name, (0.0, 0.0)))
            flops += fl
            hbm_bytes += b
            bytes_by_family[fam] += b
        if region_of is not None:
            region = region_of.get(dedup or name,
                                   region_of.get(name, "other"))
            by_region[region] += dur
    return (dict(by_family), dict(by_region), total, flops, hbm_bytes,
            dict(by_name), dict(n_exec), dict(bytes_by_family))


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
    best = float("inf")
    for _ in range(_PEAK_REPEATS):      # best-of-N: contention only slows
        t0 = time.perf_counter()
        float(run(a, b))
        best = min(best, time.perf_counter() - t0)
    return 2.0 * n ** 3 * k_iter / best / 1e12


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
    ap.add_argument("--tcfg", default="",
                    help='JSON TrackerConfig overrides, e.g. '
                         '\'{"sdf_gather_cache": false}\'')
    ap.add_argument("--tiled", action="store_true",
                    help="profile with the block-tiled warp (warp_tiled=True)")
    ap.add_argument("--detail", type=int, default=0,
                    help="print the top-N instructions by device time with "
                         "family/region/provenance (copy-budget attribution)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from difusion_tpu.utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import bench as bench_mod

    peak = measured_peak_tflops()
    print(f"measured bf16 matmul peak: {peak:.1f} TFLOP/s", flush=True)

    over = dict(warp_tiled=True) if args.tiled else {}
    if args.tcfg:
        import json as _json
        over.update(_json.loads(args.tcfg))
    system, chunks, h, w = bench_mod.build_system(
        n_chunks=args.chunks, tcfg_overrides=over or None)
    dev_chunks = [jnp.asarray(c) for c in chunks]
    jax.block_until_ready(dev_chunks)
    for c in dev_chunks:                      # warm + flush
        system.process_chunk(c, h, w)
    np.asarray(system.tracker.last_pose.t)

    dec_bench = decoder_microbench(system, peak)
    print(f"decoder microbench: {dec_bench}", flush=True)

    # untraced timing (the profiler inflates wall time on this transport):
    # median of N passes, individual passes recorded for auditability
    n_frames = args.chunks * CHUNK
    frame_ms_passes = []
    for _ in range(_PEAK_REPEATS):
        t0 = time.perf_counter()
        for c in dev_chunks:
            system.process_chunk(c, h, w)
        np.asarray(system.tracker.last_pose.t)
        frame_ms_passes.append(1e3 * (time.perf_counter() - t0) / n_frames)
    frame_ms = sorted(frame_ms_passes)[len(frame_ms_passes) // 2]

    hbm_gbps = measured_hbm_gbps()
    print(f"measured HBM stream bandwidth: {hbm_gbps:.0f} GB/s", flush=True)

    # fusion classifier + per-instruction cost table from the compiled scan
    fusion_family = {}
    region_of = {}
    costs = None
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
        costs = build_fusion_costs(hlo_text)
        print(f"classified {len(fusion_family)} fusions, "
              f"{len(costs)} cost entries from HLO", flush=True)
    except Exception as e:
        print(f"HLO classification unavailable: {e}", flush=True)

    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)   # only THIS run's trace
    with jax.profiler.trace(args.trace_dir):
        for c in dev_chunks:
            system.process_chunk(c, h, w)
        np.asarray(system.tracker.last_pose.t)

    (fam_us, region_us, total_us, flops, hbm_b, name_us,
     n_exec, fam_bytes) = parse_trace(args.trace_dir, fusion_family,
                                      region_of, costs)

    if args.detail > 0:
        # attribute the copy/elementwise budget to its concrete fusions
        # (round-3 verdict item 4): top device-time instructions with
        # family, region, execution count, and producing-op provenance
        # (op_name metadata from the compiled HLO)
        meta_of = {}
        try:
            for m in re.finditer(r"%([\w.\-]+) = [^\n]*?metadata=\{[^}]*?"
                                 r"op_name=\"([^\"]*)\"", hlo_text):
                meta_of[m.group(1)] = m.group(2)
        except NameError:
            pass
        print(f"\ntop {args.detail} instructions by device time:")
        for nm, us in sorted(name_us.items(), key=lambda kv: -kv[1])[:args.detail]:
            fam = classify(nm, "", fusion_family)
            reg = region_of.get(nm, "?")
            op = meta_of.get(nm, "")[-110:]
            print(f"  {us / 1e3 / n_frames:7.3f} ms/fr x{n_exec[nm] // max(args.chunks, 1):<4}"
                  f" {fam:<11} {reg:<10} {nm[:40]:<40} {op}", flush=True)
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
        "measured_hbm_gbps": round(hbm_gbps, 1),
        **dec_bench,
    }
    if flops > 0:
        # whole-frame arithmetic accounting (round-3 verdict item 7):
        # execution-weighted matmul/conv FLOPs and HBM traffic from the
        # trace, so the GN while_loop's measured trip count is in the
        # number.  overall_mfu is the compute-roofline position;
        # hbm_roofline_frac the memory-roofline position.  With space-aware
        # byte pricing both come out far below 1 -- XLA parks the frame's
        # working set in VMEM, so the budget is bound by op-issue/VPU
        # occupancy, not by either roofline; both fracs are context for
        # decoder_mfu, not targets.
        gflops_frame = flops / n_frames / 1e9
        mfu = (flops / (total_us * 1e-6)) / (peak * 1e12)
        hbm_frac = (hbm_b / (total_us * 1e-6)) / (hbm_gbps * 1e9)
        out["program_gflops_per_frame"] = round(gflops_frame, 3)
        out["overall_mfu"] = round(mfu, 4)
        out["hbm_gb_per_frame"] = round(hbm_b / n_frames / 1e9, 4)
        out["hbm_roofline_frac"] = round(hbm_frac, 3)
        out["hbm_mb_per_frame_by_family"] = {
            k: round(v / n_frames / 1e6, 1)
            for k, v in sorted(fam_bytes.items(), key=lambda kv: -kv[1])}
        out["bytes_accounting"] = (
            "memory-space-aware dataflow model: buffers with S(1)/S(2) "
            "layout annotations (VMEM/SMEM, placed by XLA's memory-space-"
            "assignment pass) price zero HBM bytes; the staging transfers "
            "themselves (copy-start/-done, async slice prefetches) are "
            "priced on their -done instruction, HBM side only; fusion "
            "reads/writes are gated on call-site operand/result spaces "
            "with windowed (dynamic-slice/gather) reads and in-place DUS "
            "carries counted at touched size.  Still an upper bound "
            "(shared operands may double-count), but per-family implied "
            "bandwidth now sits below measured_hbm_gbps.  With the SLAM "
            "working set VMEM-resident, hbm_roofline_frac is far below 1: "
            "the frame is NOT HBM-bound -- the elementwise/copy budget is "
            "VPU work and VMEM relayouts, i.e. occupancy/latency-shaped, "
            "so further perf comes from fewer/larger ops in the GN loop, "
            "not from reducing HBM traffic.")
    # round-5 verdict item 4: the two named gn_track experiments, run and
    # measured (tools/gn_ab.py interleaved wall A/B + deterministic trace
    # deltas from --tcfg ablation rooflines).  Both NEGATIVE at tracker
    # scale; knobs remain as opt-in records.
    out["gn_experiments_r05"] = {
        "sdf_gather_cache": {
            "verdict": "negative (device)",
            "wall_ms_delta_sessions": [-0.35, -0.27, -0.04],
            "trace_device_ms_per_frame": {"off": 4.42, "on": 4.53},
            "trace_gn_track_ms": {"off": 2.121, "on": 2.464},
            "why": "carried (N, 3+L+1) cache state + per-iteration cond "
                   "cost more loop-boundary copies than the hoisted "
                   "~0.3 ms row gather saves"},
        "gn_unroll_2": {
            "verdict": "negative (wall)",
            "wall_ms_delta": +1.73,
            "why": "the duplicated body doubles the loop program; the "
                   "relayout copies it meant to amortize are per-"
                   "evaluation, not per-trip"},
        "solve_dtype_blocked": {
            "verdict": "cost-neutral accuracy option",
            "wall_ms_delta": -0.26,
            "note": "layout-native blocked gram ~free, but only the full "
                    "TwoSum cascade (+1.9 ms) pins the loop300 chaos band "
                    "(ACCURACY_r05 loop_noisy_band)"},
    }
    out["measurement_meta"] = {
        "chunks": args.chunks, "frames_per_chunk": CHUNK,
        "warmup_passes": 1, "timed_passes": _PEAK_REPEATS,
        "frame_ms_passes": [round(p, 2) for p in frame_ms_passes],
        "peak_bench": f"4096^3 bf16 matmul x32, scalar out, "
                      f"best of {_PEAK_REPEATS}",
        "hbm_bench": f"1GB f32 stream x24, scalar out, "
                     f"best of {_PEAK_REPEATS}",
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d"),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
