"""Unit tests for tools/roofline.py's compiled-HLO cost parser.

The whole-frame MFU / HBM-roofline artifact (BENCH_ROOFLINE.json) is built
from this parser's per-instruction (flops, bytes); these tests pin its
contract on a synthetic compiled-TPU-HLO snippet: bare %operand names, dots
lowered to convolutions (dim_labels, optional window), multi-output (tuple)
fusions, and the pallas custom-call pricing.
"""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from roofline import _decoder_row_flops, _shape_info, build_fusion_costs


HLO = """\
HloModule jit_step, entry_computation_layout={...}

%fused_matmul (param_0.1: f32[64,32], param_1.2: f32[32,128]) -> f32[64,128] {
  %param_0.1 = f32[64,32]{1,0:T(8,128)} parameter(0)
  %param_1.2 = f32[32,128]{1,0:T(8,128)} parameter(1)
  ROOT %convolution.9 = f32[64,128]{1,0:T(8,128)} convolution(%param_0.1, %param_1.2), dim_labels=bf_io->bf, metadata={op_name="jit(step)/dot_general"}
}

%fused_multi (param_0.3: f32[16,256], param_1.4: f32[256,8]) -> (f32[16,8], pred[16]) {
  %param_0.3 = f32[16,256]{1,0:T(8,128)} parameter(0)
  %param_1.4 = f32[256,8]{1,0:T(8,128)} parameter(1)
  %convolution.11 = f32[16,8]{1,0:T(8,128)} convolution(%param_0.3, %param_1.4), dim_labels=bf_io->bf
  %compare.2 = pred[16]{0:T(8,128)} compare(%param_0.3, %param_0.3), direction=EQ
  ROOT %tuple.5 = (f32[16,8]{1,0:T(8,128)}, pred[16]{0:T(8,128)}) tuple(%convolution.11, %compare.2)
}

ENTRY %main (p0: f32[64,32], p1: f32[32,128], img: bf16[1,10,10,3], filt: bf16[3,3,3,4]) -> f32[64,128] {
  %p0 = f32[64,32]{1,0:T(8,128)} parameter(0)
  %p1 = f32[32,128]{1,0:T(8,128)} parameter(1)
  %img = bf16[1,10,10,3]{3,2,1,0:T(8,128)(2,1)} parameter(2)
  %filt = bf16[3,3,3,4]{3,2,1,0:T(8,128)(2,1)} parameter(3)
  %q0 = f32[16,256]{1,0:T(8,128)} parameter(4)
  %q1 = f32[256,8]{1,0:T(8,128)} parameter(5)
  %pts = f32[512,32]{1,0:T(8,128)} parameter(6)
  %fusion.1 = f32[64,128]{1,0:T(8,128)} fusion(%p0, %p1), kind=kOutput, calls=%fused_matmul
  %fusion.2 = (f32[16,8]{1,0:T(8,128)}, pred[16]{0:T(8,128)}) fusion(%q0, %q1), kind=kOutput, calls=%fused_multi
  %convolution.3 = bf16[1,10,10,4]{3,2,1,0:T(8,128)(2,1)} convolution(%img, %filt), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  %custom-call.7 = f32[512,9]{1,0:T(8,128)} custom-call(%pts), custom_call_target="tpu_custom_call", metadata={op_name="pallas_call" source_file="/root/repo/difusion_tpu/core/meshing.py" source_line=1}
  ROOT %copy.1 = f32[64,128]{1,0:T(8,128)} copy(%fusion.1)
}
"""


def test_shape_info_scalar_array_tuple():
    assert _shape_info("f32[8192,128]{1,0:T(8,128)}") == (
        (8192, 128), 8192 * 128 * 4, 8192 * 128 * 4)
    assert _shape_info("bf16[16]{0}") == ((16,), 32, 32)
    assert _shape_info("f32[]") == ((), 4, 4)
    shape, b, raw = _shape_info("(f32[16,8]{1,0}, pred[16]{0}, bf16[4,4]{1,0})")
    assert shape == (16, 8)
    assert b == raw == 16 * 8 * 4 + 16 * 1 + 4 * 4 * 2
    assert _shape_info("opaque") == ((), 0, 0)


def test_shape_info_memory_space_aware():
    """Buffers parked off HBM (S(1) = VMEM, S(2) = SMEM) count zero HBM
    bytes but keep their raw size (touched-region pricing needs it)."""
    shape, b, raw = _shape_info("f32[240,320]{0,1:T(8,128)S(1)}")
    assert shape == (240, 320)
    assert b == 0 and raw == 240 * 320 * 4
    # copy-start convention: (dest, src, ctx) -- HBM side counted once
    _, b, raw = _shape_info(
        "(s32[196000]{0:T(1024)S(1)}, s32[196000]{0:T(1024)}, u32[]{:S(2)})")
    assert b == 196000 * 4
    assert raw == 2 * 196000 * 4 + 4


def test_costs_plain_matmul_fusion():
    costs = build_fusion_costs(HLO)
    fl, b = costs["fusion.1"]
    # dot-as-conv: 2 * prod(out 64x128) * lhs feature dim 32 (dim_labels bf)
    assert fl == 2 * 64 * 128 * 32
    # bytes: operands p0 + p1 + own result
    assert b == (64 * 32 + 32 * 128 + 64 * 128) * 4


def test_costs_multi_output_fusion_not_skipped():
    """Tuple-result fusions must be priced, not silently dropped."""
    costs = build_fusion_costs(HLO)
    assert "fusion.2" in costs
    fl, b = costs["fusion.2"]
    assert fl == 2 * 16 * 8 * 256
    # bytes: q0 + q1 + tuple members (f32[16,8] + pred[16])
    assert b == (16 * 256 * 4 + 256 * 8 * 4) + (16 * 8 * 4 + 16 * 1)


def test_costs_windowed_convolution():
    costs = build_fusion_costs(HLO)
    fl, b = costs["convolution.3"]
    # 2 * prod(out 1*10*10*4) * window 3*3 * lhs feature dim 3 (b01f)
    assert fl == 2 * (10 * 10 * 4) * 9 * 3
    assert b == (1 * 10 * 10 * 3) * 2 + (3 * 3 * 3 * 4) * 2 \
        + (1 * 10 * 10 * 4) * 2


def test_costs_pallas_custom_call_rows():
    costs = build_fusion_costs(HLO)
    fl, b = costs["custom-call.7"]
    # forward-only pricing (call site is not tracker.py): rows x analytic
    assert fl == 512 * _decoder_row_flops(fwd_only=True)
    assert b == 512 * 32 * 4 + 512 * 9 * 4


def test_sync_copy_priced_as_read_plus_write():
    # a sync HBM->HBM relayout copy streams its buffer twice
    fl, b = build_fusion_costs(HLO)["copy.1"]
    assert fl == 0
    assert b == 2 * 64 * 128 * 4


ASYNC_HLO = """\
HloModule jit_async, entry_computation_layout={...}

%async_computation.16 (param_0: f32[65536,29]) -> f32[16384,29] {
  %param_0 = f32[65536,29]{1,0:T(8,128)} parameter(0)
  ROOT %slice.9 = f32[16384,29]{1,0:T(8,128)S(1)} slice(%param_0), slice={[0:16384], [0:29]}
}

ENTRY %main (p0: s32[196000], p1: f32[65536,29]) -> f32[16384,29] {
  %p0 = s32[196000]{0:T(1024)} parameter(0)
  %p1 = f32[65536,29]{1,0:T(8,128)} parameter(1)
  %copy-start.2 = (s32[196000]{0:T(1024)S(1)}, s32[196000]{0:T(1024)}, u32[]{:S(2)}) copy-start(%p0)
  %copy-done.2 = s32[196000]{0:T(1024)S(1)} copy-done(%copy-start.2)
  %vm = f32[128,29]{1,0:T(8,128)S(1)} parameter(2)
  %copy-start.3 = (f32[128,29]{1,0:T(8,128)}, f32[128,29]{1,0:T(8,128)S(1)}, u32[]{:S(2)}) copy-start(%vm)
  %copy-done.3 = f32[128,29]{1,0:T(8,128)} copy-done(%copy-start.3)
  %slice-start.16 = ((f32[65536,29]{1,0:T(8,128)}), f32[16384,29]{1,0:T(8,128)S(1)}, s32[]{:S(2)}) async-start(%p1), calls=%async_computation.16
  ROOT %slice-done.16 = f32[16384,29]{1,0:T(8,128)S(1)} async-done(%slice-start.16)
}
"""


def test_async_transfers_priced_on_done_hbm_side_only():
    """Memory-space-assignment staging: HBM->VMEM prefetch reads the HBM
    source once; VMEM->HBM writeback writes the HBM dest once; the async
    slice prefetch reads only the touched (result-sized) region of its HBM
    source.  -start halves price nothing (no double count)."""
    costs = build_fusion_costs(ASYNC_HLO)
    assert "copy-start.2" not in costs
    assert "slice-start.16" not in costs
    assert costs["copy-done.2"] == (0.0, 196000 * 4)        # HBM read
    assert costs["copy-done.3"] == (0.0, 128 * 29 * 4)      # HBM write
    assert costs["slice-done.16"] == (0.0, 16384 * 29 * 4)  # touched read


VMEM_FUSION_HLO = """\
HloModule jit_vmem, entry_computation_layout={...}

%fused_mul (param_0.1: f32[240,320], param_1.1: f32[240,320]) -> f32[240,320] {
  %param_0.1 = f32[240,320]{1,0:T(8,128)} parameter(0)
  %param_1.1 = f32[240,320]{1,0:T(8,128)} parameter(1)
  ROOT %mul.1 = f32[240,320]{1,0:T(8,128)} multiply(%param_0.1, %param_1.1)
}

ENTRY %main (a: f32[240,320], b: f32[240,320]) -> f32[240,320] {
  %a = f32[240,320]{1,0:T(8,128)S(1)} parameter(0)
  %b = f32[240,320]{1,0:T(8,128)} parameter(1)
  ROOT %fusion.5 = f32[240,320]{1,0:T(8,128)S(1)} fusion(%a, %b), kind=kLoop, calls=%fused_mul
}
"""


SYNC_OPS_HLO = """\
HloModule jit_sync, entry_computation_layout={...}

ENTRY %main (a: f32[1024,64], u: f32[16,64]) -> f32[256,64] {
  %a = f32[1024,64]{1,0:T(8,128)} parameter(0)
  %u = f32[16,64]{1,0:T(8,128)} parameter(1)
  %vs = f32[1024,64]{1,0:T(8,128)S(1)} parameter(2)
  %i0 = s32[]{:S(2)} parameter(3)
  %slice.1 = f32[256,64]{1,0:T(8,128)S(1)} slice(%a), slice={[0:256], [0:64]}
  %slice.2 = f32[256,64]{1,0:T(8,128)} slice(%vs), slice={[0:256], [0:64]}
  ROOT %dynamic-update-slice.1 = f32[1024,64]{1,0:T(8,128)} dynamic-update-slice(%a, %u, %i0, %i0)
}
"""


def test_sync_windowed_ops_touched_bytes_only():
    """Sync slices read only the touched (result-raw) region of an HBM
    source and write only an HBM destination; a DUS on an HBM dest reads
    its update and rewrites only the update region (in-place alias)."""
    costs = build_fusion_costs(SYNC_OPS_HLO)
    # HBM source -> VMEM dest: read 256x64 f32, write 0
    assert costs["slice.1"] == (0.0, 256 * 64 * 4)
    # VMEM source -> HBM dest: read 0, write 256x64
    assert costs["slice.2"] == (0.0, 256 * 64 * 4)
    # DUS: update 16x64 read + written once; the 1024x64 dest is aliased
    assert costs["dynamic-update-slice.1"] == (0.0, 2 * 16 * 64 * 4)


def test_fusion_spaces_read_from_call_site():
    """The fusion's result type and its operands' own types carry the
    buffer-assignment S(1) annotations; body intermediates are unannotated
    and must not be trusted.  Here: VMEM output (write=0), one VMEM operand
    (read=0), one HBM operand (read=full)."""
    fl, b = build_fusion_costs(VMEM_FUSION_HLO)["fusion.5"]
    assert b == 240 * 320 * 4
