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
    assert _shape_info("f32[8192,128]{1,0:T(8,128)}") == ((8192, 128),
                                                          8192 * 128 * 4)
    assert _shape_info("bf16[16]{0}") == ((16,), 32)
    assert _shape_info("f32[]") == ((), 4)
    shape, b = _shape_info("(f32[16,8]{1,0}, pred[16]{0}, bf16[4,4]{1,0})")
    assert shape == (16, 8)
    assert b == 16 * 8 * 4 + 16 * 1 + 4 * 4 * 2
    assert _shape_info("opaque") == ((), 0)


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


def test_copy_not_priced():
    # non-compute ops stay out of the costs map (their time still lands in
    # the stage budget via the trace; flops/bytes would be spurious)
    assert "copy.1" not in build_fusion_costs(HLO)
