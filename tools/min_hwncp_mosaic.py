#!/usr/bin/env python
"""Minimize the hwncp remote-compile failure (gate_r4_hwncp.log).

The v2-hwncp gate failed with `tpu_compile_helper subprocess exit code
1` and NO Mosaic diagnostic, shipping a 47 MB MLIR payload
(code_len=47283814) — consistent with code-size blowup: at layer1
shapes the kernel's default band heuristic (6 MB working set per
band) picks rb=2 -> bands=32, and the kernel unrolls
bands x (2 + 4*nblocks) band loops each emitting 12-18 strided
slice+concat+matmul groups. This driver compiles
fused_bottleneck_i8v2_hwncp_stage IN ISOLATION at the exact layer1
trunk shapes across bands/batch_tile/nblocks, printing one JSON line
per case — if big-rb (few-band) cases compile while the default
fails, the fix is the band heuristic, not the kernel algebra.

Usage: python tools/min_hwncp_mosaic.py [--cases a,b] [--list]
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
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    import jax.numpy as jnp
    from instaorder_tpu.ops import pallas_blocks as pb

    rng = np.random.RandomState(0)

    def u8(*shape):  # activations 0..127 post-relu
        return jnp.asarray(rng.randint(0, 128, shape), jnp.int8)

    def bf(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 0.05,
                           jnp.bfloat16)

    def f32(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 0.01)

    def stage(N=8, H=64, W=64, Cin=64, Cm=64, Cout=256, nblocks=2, **kw):
        # layer1 trunk shapes: x int8 (H, W, N, Cin); projection
        # (w1, b1, w2, b2, w3, b3, wd, bd) + nblocks identity blocks
        # (w1, b1, w2, b2, w3, b3) + rs — quantize.py:631-644
        flat = [bf(Cin, Cm), f32(Cm), bf(3, 3, Cm, Cm), f32(Cm),
                bf(Cm, Cout), f32(Cout), bf(Cin, Cout), f32(Cout)]
        for _ in range(nblocks):
            flat += [bf(Cout, Cm), f32(Cm), bf(3, 3, Cm, Cm), f32(Cm),
                     bf(Cm, Cout), f32(Cout)]
        rs = jnp.full((nblocks,), 0.01, jnp.float32)
        return pb.fused_bottleneck_i8v2_hwncp_stage(
            u8(H, W, N, Cin), *flat, rs, nblocks=nblocks,
            out_int8=True, **kw)

    CASES = {
        # the gate shape (N=104 at gate batch 52 doubled... gate runs
        # B=8-tiled anyway); default bands -> rb=2, bands=32
        'l1-default': lambda: stage(N=8),
        'l1-bands16': lambda: stage(N=8, bands=16),
        'l1-bands8': lambda: stage(N=8, bands=8),
        'l1-bands4': lambda: stage(N=8, bands=4),
        'l1-bands2': lambda: stage(N=8, bands=2),
        'l1-bands1': lambda: stage(N=8, bands=1),
        'l1-nblocks1': lambda: stage(N=8, nblocks=1),
        'l1-nblocks1-bands8': lambda: stage(N=8, nblocks=1, bands=8),
        'l1-small': lambda: stage(N=8, H=16, W=16),  # default bands small
        'l1-bt16-bands8': lambda: stage(N=16, batch_tile=16, bands=8),
        'l1-n360-bands8': lambda: stage(N=360, bands=8),
        'l1-n360-bands4': lambda: stage(N=360, bands=4),
        # r5: grid isolation. r4 data: every pass is grid=1/B=8; fails
        # are B=16 (grid=1) and N=360/B=8 (grid=45). These separate
        # "grid>1" from "B>8" and re-test determinism of the failures.
        'l1-n16-b8': lambda: stage(N=16, batch_tile=8, bands=8),
        'l1-n24-b8': lambda: stage(N=24, batch_tile=8, bands=8),
        'l1-n360-b8-rerun': lambda: stage(N=360, bands=8),
        'l1-bt16-small': lambda: stage(N=16, batch_tile=16, bands=8,
                                       H=16, W=16),
        'l1-bt16-bands1': lambda: stage(N=16, batch_tile=16, bands=1),
        'l1-bt16-nblocks1': lambda: stage(N=16, batch_tile=16, bands=8,
                                          nblocks=1),
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
                              'error': msg[:1500]}))
            # full untruncated error (the Mosaic diagnostic sits past
            # the libtpu init noise the 1500-char cut discards)
            with open(os.path.join(REPO, 'tools', 'artifacts',
                                   f'min_hwncp_err_{name}.txt'),
                      'w') as fh:
                fh.write(msg)
        sys.stdout.flush()
    if failed:
        print(f'FAIL: {failed}', file=sys.stderr)
        sys.exit(1)
    print('all cases compiled + ran', file=sys.stderr)


if __name__ == '__main__':
    main()
