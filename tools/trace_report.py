#!/usr/bin/env python
"""Per-op device-time report from a jax.profiler trace of the serving
megastep (the aux tracing subsystem, SURVEY.md §5 — the reference has
only wall-clock AverageMeters).

Captures one traced run of the bench megastep on the current backend,
parses the xplane proto (pure-python protobuf impl per CLAUDE.md), and
prints the top ops by device time plus a stage rollup. Use to find the
next serving bottleneck instead of guessing.

Usage: python tools/trace_report.py [--pairs 540] [--dtype bf16]
       [--pallas-features identity] [--top 25]
"""
import argparse
import glob
import os
import sys

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


import re


def classify_parts(name):
    """(lhs name, opcode) of one xplane HLO row. Classify on these ONLY
    — the full HLO text embeds operand names, so a substring match over
    it mislabels (e.g. a conv fusion reading %copy.139 is not a
    relayout; an XLA %fused_convert is not a pallas call)."""
    lhs = name.split(' = ', 1)[0].lstrip('%')
    # opcode = first lowercase word directly followed by '(' in the
    # RHS; robust to tuple return types (whose parens hold only dtypes
    # like bf16[...] / layout tokens like T(8,128), which are either
    # uppercase or not word-then-paren)
    rhs = name.split(' = ', 1)[1] if ' = ' in name else ''
    m = re.search(r'([a-z][a-z0-9_-]*)\(', rhs)
    return lhs, (m.group(1) if m else '')


def classify_kind(name):
    lhs, opcode = classify_parts(name)
    if opcode == 'custom-call':
        if 'hwnc_stage' in lhs:
            return 'pallas hwnc stage'
        if 'hwnc' in lhs:
            return 'pallas hwnc'
        return 'pallas other'
    if 'clamp_convert' in lhs:
        return 'quantize epilogue'
    if (opcode in ('convert', 'bitcast-convert')
            or lhs.startswith(('convert', 'bitcast-convert'))):
        return 'relayout/copy'
    if opcode == 'convolution' or 'conv' in lhs:
        return 'convolution'
    if opcode == 'dot' or 'dot' in lhs:
        return 'matmul'
    if (opcode in ('transpose', 'copy', 'bitcast')
            or lhs.startswith(('transpose', 'copy', 'bitcast'))):
        return 'relayout/copy'
    if opcode == 'fusion':
        return 'fusion (elementwise/quantize)'
    if opcode.startswith('reduce') or 'reduce' in lhs:
        return 'reduce'
    return 'other'


def classify_stage(name):
    """Bucket by the op's activation resolution (first spatial dims in
    its result type): prep/stem/L1..L4/head flame summary."""
    rhs = name.split(' = ', 1)[1] if ' = ' in name else ''
    m = re.search(r'\[([\d,]+)\]', rhs)
    if not m:
        return 'scalar/other'
    dims = [int(d) for d in m.group(1).split(',') if d]
    spatial = {256: 'prep(256^2)', 480: 'prep(480p)', 128: 'stem(128^2)',
               64: 'L1(64^2)', 32: 'L2(32^2)', 16: 'L3(16^2)',
               8: 'L4(8^2)'}
    # a dim that appears TWICE (h == w for every stage here)
    for d, lab in spatial.items():
        if dims.count(d) >= 2:
            return lab
    if 480 in dims or 640 in dims:
        return 'prep(480p)'
    return 'head/other'


def build_megastep(args):
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    import numpy as np
    import jax.numpy as jnp
    from instaorder_tpu.models import resnet
    from instaorder_tpu.models.folding import (fold_resnet,
                                               apply_folded_siamese)
    from instaorder_tpu.core.nn import tree_cast
    from instaorder_tpu.ops.pairs import (build_pair_batch_matmul,
                                          pair_rois, all_pair_indices)

    params, stats, cfg = resnet.init(jax.random.PRNGKey(0),
                                     arch='resnet50', in_channels=5,
                                     num_classes=2, weight_init='xavier')
    folded_f32 = fold_resnet(params, stats, cfg)
    folded = tree_cast(folded_f32, jnp.bfloat16)
    rng = np.random.RandomState(0)
    H, W, N = 480, 640, 10
    n_pairs = N * (N - 1) // 2
    S = max(1, args.pairs // n_pairs)
    images = jnp.asarray(rng.randint(0, 255, (S, H, W, 3)), jnp.float32)
    masks = np.zeros((S, N, H, W), np.float32)
    bboxes = np.zeros((S, N, 4), np.float32)
    for s in range(S):
        for k in range(N):
            y0, x0 = rng.randint(0, H - 100), rng.randint(0, W - 100)
            hh, ww = rng.randint(30, 100, 2)
            masks[s, k, y0:y0 + hh, x0:x0 + ww] = 1
            bboxes[s, k] = [x0, y0, ww, hh]
    pair_idx = jnp.asarray(all_pair_indices(N)[0])
    pallas = (tuple(args.pallas_features.split(','))
              if args.pallas_features else True)

    def prep_all(images, masks, bboxes):
        if getattr(args, 'prep_rgb', 'einsum') == 'pallas5':
            from instaorder_tpu.ops.pairs import build_pair_batches_fused
            rois = jax.vmap(lambda b: pair_rois(b, pair_idx))(bboxes)
            return build_pair_batches_fused(
                images, masks, pair_idx, rois, out_size=256,
                dtype=jnp.bfloat16, fuse_masks=True,
                passes=(1 if getattr(args, 'prep_precision', 'high')
                        == 'default' else 3))

        def prep(im, m, b):
            rois = pair_rois(b, pair_idx)
            return build_pair_batch_matmul(im, m, pair_idx, rois,
                                           out_size=256,
                                           dtype=jnp.bfloat16)
        return jax.vmap(prep)(images, masks, bboxes).reshape(
            -1, 256, 256, 5)

    if args.dtype in ('int8', 'int8c'):
        from instaorder_tpu.models import quantize as Q
        import numpy as _np
        calib = _np.asarray(jax.jit(prep_all)(
            images, jnp.asarray(masks), jnp.asarray(bboxes)),
            _np.float32)
        scales = Q.calibrate_folded_resnet(folded_f32, cfg, [calib])
        if args.dtype == 'int8':     # v2: boundary storage, bf16 compute
            qp = Q.quantize_folded_v2(folded_f32, cfg, scales)
            if getattr(args, 'directions', 2) == 1:
                fwd1 = lambda qp, x: Q.apply_folded_v2(
                    qp, cfg, x, use_pallas=pallas, stem_chunks=1,
                    conv2_mode=args.hwnc_conv2, hwnc_io=args.hwnc_io)

                @jax.jit
                def megastep(qp, images, masks, bboxes):
                    x = prep_all(images, masks, bboxes)
                    s1 = jax.nn.sigmoid(fwd1(qp, x))
                    return (s1[:, 1] > .5, s1[:, 0] > .5)

                return megastep, (qp, images, jnp.asarray(masks),
                                  jnp.asarray(bboxes))
            sia = lambda qp, x: Q.apply_folded_v2_siamese(
                qp, cfg, x, use_pallas=pallas, stem_chunks=1,
                conv2_mode=args.hwnc_conv2, hwnc_io=args.hwnc_io)
        else:                        # full int8 compute (round 2)
            qp = Q.quantize_folded_resnet(folded_f32, cfg, scales)
            sia = lambda qp, x: Q.apply_folded_int8_siamese(
                qp, cfg, x, use_pallas=pallas, stem_chunks=4)

        @jax.jit
        def megastep(qp, images, masks, bboxes):
            x = prep_all(images, masks, bboxes)
            o1, o2 = sia(qp, x)
            s1, s2 = jax.nn.sigmoid(o1), jax.nn.sigmoid(o2)
            return ((s1[:, 1] + s2[:, 0]) / 2 > .5,
                    (s1[:, 0] + s2[:, 1]) / 2 > .5)

        return megastep, (qp, images, jnp.asarray(masks),
                          jnp.asarray(bboxes))

    @jax.jit
    def megastep(folded, images, masks, bboxes):
        x = prep_all(images, masks, bboxes)
        o1, o2 = apply_folded_siamese(folded, cfg, x, dtype=jnp.bfloat16,
                                      use_pallas=pallas)
        s1, s2 = jax.nn.sigmoid(o1), jax.nn.sigmoid(o2)
        return ((s1[:, 1] + s2[:, 0]) / 2 > .5,
                (s1[:, 0] + s2[:, 1]) / 2 > .5)

    return megastep, (folded, images, jnp.asarray(masks),
                      jnp.asarray(bboxes))


def parse_xplane(trace_dir):
    """Aggregate device-time (ms) per HLO op name from the xplane proto
    (schema: XSpace -> XPlane -> XLine -> XEvent + event_metadata map;
    tensorflow.tsl.profiler.protobuf.xplane_pb2, pure-python impl)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.xplane.pb'))
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {trace_dir}')
    per_line = {}
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, 'rb') as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if 'TPU' not in plane.name and 'Device' not in plane.name:
                continue
            md = dict(plane.event_metadata.items())
            for line in plane.lines:
                agg = per_line.setdefault(line.name, {})
                for ev in line.events:
                    m = md.get(ev.metadata_id)
                    name = m.name if m else str(ev.metadata_id)
                    a = agg.setdefault(name, [0.0, 0])
                    a[0] += ev.duration_ps / 1e9
                    a[1] += 1
    return {ln: sorted(((v[0], v[1], k) for k, v in agg.items()),
                       reverse=True)
            for ln, agg in per_line.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pairs', type=int, default=540)
    ap.add_argument('--pallas-features', default=None)
    ap.add_argument('--dtype', default='bf16',
                    choices=['bf16', 'int8', 'int8c'])
    ap.add_argument('--hwnc-conv2', default='im2col',
                    choices=['im2col', 'acc', 'scatter', 'scatter16'])
    ap.add_argument('--hwnc-io', default='float', choices=['float', 's8'])
    ap.add_argument('--prep-rgb', default='einsum',
                    choices=['einsum', 'pallas5'])
    ap.add_argument('--prep-precision', default='high',
                    choices=['high', 'default'])
    ap.add_argument('--directions', type=int, default=2, choices=[1, 2])
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--out', default='/tmp/instaorder_trace')
    args = ap.parse_args()

    import shutil
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)   # stale sessions would mix into the rollup

    import jax
    megastep, inputs = build_megastep(args)
    out = megastep(*inputs)
    jax.block_until_ready(out)          # compile + warm
    out = megastep(*inputs)
    jax.block_until_ready(out)

    from instaorder_tpu.utils.profiling import trace
    with trace(args.out):
        for _ in range(3):
            out = megastep(*inputs)
        jax.block_until_ready(out)

    by_line = parse_xplane(args.out)
    for ln, rows in by_line.items():
        total = sum(r[0] for r in rows)
        print(f'\n== line [{ln}]  total {total:.1f} ms over 3 steps ==')
        for ms, calls, name in rows[:args.top]:
            print(f'{ms:10.2f} {calls:6d}  {name[:110]}')
        # class + stage rollups (module-level classifiers,
        # unit-tested in tests/test_trace_report.py)
        agg = {}
        for ms, calls, name in rows:
            a = agg.setdefault(classify_kind(name), [0.0, 0])
            a[0] += ms
            a[1] += calls
        print('  -- rollup --')
        for lab, (ms, calls) in sorted(agg.items(),
                                       key=lambda kv: -kv[1][0]):
            pct = 100.0 * ms / max(total, 1e-9)
            print(f'{ms:10.2f} {calls:6d}  {pct:5.1f}%  {lab}')

        agg = {}
        for ms, calls, name in rows:
            a = agg.setdefault(classify_stage(name), [0.0, 0])
            a[0] += ms
            a[1] += calls
        print('  -- by stage --')
        for lab, (ms, calls) in sorted(agg.items(),
                                       key=lambda kv: -kv[1][0]):
            pct = 100.0 * ms / max(total, 1e-9)
            print(f'{ms:10.2f} {calls:6d}  {pct:5.1f}%  {lab}')


if __name__ == '__main__':
    main()
