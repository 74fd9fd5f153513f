#!/usr/bin/env python
"""Minimize the int8c-hwnc Mosaic remote-compile failure to one kernel.

Round-3 gate (tools/artifacts/gate_r3g.log) showed the FULL int8c-hwnc
path failing with an opaque `MosaicError ... HTTP 500` on real hardware
while every v2 (bf16-compute) hwnc config compiled fine. This driver
compiles each int8c hwnc kernel IN ISOLATION on the real TPU at the
exact per-layer resnet50 shapes the trunk uses (plus reduced-size and
knob variants), printing one JSON line per case — the failing subset
localises the Mosaic trigger (kernel family x shape x strategy).

Usage: python tools/min_int8c_mosaic.py [--cases a,b] [--list]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cases', default=None)
    ap.add_argument('--list', action='store_true')
    ap.add_argument('--batch', type=int, default=8,
                    help='batch size B for every case (the r3g gate that '
                         'failed ran at 360; bench serves 1080)')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    import jax.numpy as jnp
    from instaorder_tpu.ops import pallas_blocks as pb

    rng = np.random.RandomState(0)

    def s8(*shape):
        return jnp.asarray(rng.randint(-127, 128, shape), jnp.int8)

    def u8(*shape):  # activations are 0..127 post-relu
        return jnp.asarray(rng.randint(0, 128, shape), jnp.int8)

    def f32(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 0.01)

    def iden(H, W, B, Cin, Cm, **kw):
        return pb.fused_bottleneck_int8_hwnc(
            u8(H, W, B, Cin), s8(Cin, Cm), f32(Cm), f32(Cm),
            s8(3, 3, Cm, Cm), f32(Cm), f32(Cm), s8(Cm, Cin), f32(Cin),
            f32(Cin), 0.01, **kw)

    def down_s1(H, W, B, Cin, Cm, Cout):
        return pb.fused_bottleneck_down_int8_hwnc(
            u8(H, W, B, Cin), s8(Cin, Cm), f32(Cm), f32(Cm),
            s8(3, 3, Cm, Cm), f32(Cm), f32(Cm), s8(Cm, Cout), f32(Cout),
            f32(Cout), s8(Cin, Cout), f32(Cout), f32(Cout))

    def down_s2(H, W, B, Cin, Cm, Cout):
        return pb.fused_bottleneck_down_s2_int8_hwnc(
            u8(H, W, B, Cin), s8(Cin, Cm), f32(Cm), f32(Cm),
            s8(3, 3, Cm, Cm), f32(Cm), f32(Cm), s8(Cm, Cout), f32(Cout),
            f32(Cout), s8(Cin, Cout), f32(Cout), f32(Cout))

    def stem(N):
        return pb.fused_stem_int8(u8(N, 256, 256, 5), s8(7, 7, 5, 64),
                                  f32(64), f32(64))

    # trunk shapes at batch B (hwnc kernels tile batch internally, but
    # the r3g gate failure only reproduces at gate/bench batch sizes —
    # default B=8 isolates per-kernel shape triggers, --batch 360/1080
    # isolates batch-dependent ones)
    B = args.batch
    CASES = {
        'iden-l1': lambda: iden(64, 64, B, 256, 64),
        'iden-l2': lambda: iden(32, 32, B, 512, 128),
        'iden-l3': lambda: iden(16, 16, B, 1024, 256),
        'iden-l4': lambda: iden(8, 8, B, 2048, 512),
        'iden-l1-small': lambda: iden(16, 16, B, 256, 64),
        'iden-l1-bands1': lambda: iden(16, 16, B, 256, 64, bands=1),
        'iden-l1-acc': lambda: iden(64, 64, B, 256, 64,
                                    conv2_mode='acc'),
        'iden-l1-scatter': lambda: iden(64, 64, B, 256, 64,
                                        conv2_mode='scatter'),
        'down1-l1': lambda: down_s1(64, 64, B, 64, 64, 256),
        'down2-l2': lambda: down_s2(64, 64, B, 256, 128, 512),
        'down2-l3': lambda: down_s2(32, 32, B, 512, 256, 1024),
        'down2-l4': lambda: down_s2(16, 16, B, 1024, 512, 2048),
        'stem-8': lambda: stem(B),
    }
    if args.list:
        print('\n'.join(CASES))
        return
    names = args.cases.split(',') if args.cases else list(CASES)

    print('devices:', jax.devices(), file=sys.stderr)
    failed = []
    for name in names:
        try:
            out = CASES[name]()
            jax.device_get(out)  # force through the tunnel
            print(json.dumps({'case': name, 'ok': True,
                              'shape': list(out.shape)}))
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append(name)
            msg = f'{type(e).__name__}: {e}'
            print(json.dumps({'case': name, 'ok': False,
                              'error': msg[:2000]}))
        sys.stdout.flush()
    if failed:
        print(f'FAIL: {failed}', file=sys.stderr)
        sys.exit(1)
    print('all cases compiled + ran', file=sys.stderr)


if __name__ == '__main__':
    main()
