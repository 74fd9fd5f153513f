"""Unit tests for trace_report's xplane-row classifiers (the aux
tracing subsystem's rollup logic — pure string functions)."""

import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    'trace_report', os.path.join(os.path.dirname(__file__), '..',
                                 'tools', 'trace_report.py'))
tr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tr)


def test_classify_kind():
    assert tr.classify_kind(
        '%fused_bottleneck_i8v2_hwnc.13 = s8[64,64,1080,256]'
        '{3,2,1,0:T(8,128)(4,1)} custom-call(bf16[64,64,1080,256]'
    ) == 'pallas hwnc'
    assert tr.classify_kind(
        '%fused_bottleneck_i8v2_hwnc_stage.2 = s8[8,8,4,2048]{3,2,1,0} '
        'custom-call(s8[8,8,4,2048])') == 'pallas hwnc stage'
    # XLA fusion reading a %copy operand is NOT a relayout; a tuple
    # return type must still resolve the opcode
    assert tr.classify_kind(
        '%fusion.17 = (bf16[2,3]{1,0}, s8[2]{0}) fusion(bf16[2,3] '
        '%copy.139)') == 'fusion (elementwise/quantize)'
    assert tr.classify_kind(
        '%clamp_convert_fusion = s8[64,64,1080,256]{3,2,1,0:T(8,128)'
        '(4,1)} fusion(bf16[64,64,1080,256])') == 'quantize epilogue'
    # short-form row (no " = " HLO text)
    assert tr.classify_kind('copy.139') == 'relayout/copy'
    assert tr.classify_kind(
        '%copy.134 = bf16[12,90,480,640]{3,2,1,0:T(8,128)(2,1)} copy('
        'bf16[12,90,480,640])') == 'relayout/copy'


def test_classify_stage():
    assert tr.classify_stage(
        '%x = bf16[540,128,128,64]{0,3,2,1} fusion(a)') == 'stem(128^2)'
    assert tr.classify_stage(
        '%x = s8[64,64,1080,256]{3,2,1,0} custom-call(a)') == 'L1(64^2)'
    # 5-dim prep intermediate
    assert tr.classify_stage(
        '%x = f32[12,480,3,45,256]{4,1,2,3,0} fusion(a)') == 'prep(480p)'
    assert tr.classify_stage(
        '%x = bf16[12,45,2,256,256]{3,4,2,1,0} fusion(a)') \
        == 'prep(256^2)'
    assert tr.classify_stage('%x = f32[] add(a, b)') == 'scalar/other'
