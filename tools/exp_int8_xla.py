"""Experiment: XLA int8 conv/matmul throughput on the TPU vs bf16.

Answers: can the int8 serving trunk ride plain XLA convs, or do we need
Pallas kernels for every conv? Times a layer1-like bottleneck chain.
"""

import os
import time

import numpy as np

import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    # block_until_ready does not reliably block through the axon tunnel;
    # force a device->host readback of one element as the sync point
    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf[..., :1, :1]))
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv(x, w, stride=1, padding=0, ptype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=ptype)


def main():
    N, H, W = 256, 64, 64
    Cin, Cm = 256, 64
    rng = np.random.RandomState(0)
    x_f = rng.randn(N, H, W, Cin).astype(np.float32)
    w1_f = rng.randn(1, 1, Cin, Cm).astype(np.float32) * 0.1
    w2_f = rng.randn(3, 3, Cm, Cm).astype(np.float32) * 0.1
    w3_f = rng.randn(1, 1, Cm, Cin).astype(np.float32) * 0.1

    x8 = jnp.asarray(np.clip(x_f * 30, -127, 127).astype(np.int8))
    w18 = jnp.asarray(np.clip(w1_f * 300, -127, 127).astype(np.int8))
    w28 = jnp.asarray(np.clip(w2_f * 300, -127, 127).astype(np.int8))
    w38 = jnp.asarray(np.clip(w3_f * 300, -127, 127).astype(np.int8))
    xb = jnp.asarray(x_f, jnp.bfloat16)
    w1b = jnp.asarray(w1_f, jnp.bfloat16)
    w2b = jnp.asarray(w2_f, jnp.bfloat16)
    w3b = jnp.asarray(w3_f, jnp.bfloat16)

    @jax.jit
    def block_bf16(x, w1, w2, w3):
        h = jax.nn.relu(conv(x, w1, ptype=jnp.float32).astype(jnp.bfloat16))
        h = jax.nn.relu(conv(h, w2, padding=1,
                             ptype=jnp.float32).astype(jnp.bfloat16))
        h = conv(h, w3, ptype=jnp.float32)
        return jax.nn.relu(h + x.astype(jnp.float32)).astype(jnp.bfloat16)

    @jax.jit
    def block_int8(x, w1, w2, w3):
        # int8 conv -> int32 acc -> fake requant (scale+clip) -> int8
        h = conv(x, w1, ptype=jnp.int32)
        h = jnp.clip(h.astype(jnp.float32) * 0.001, 0, 127).astype(jnp.int8)
        h = conv(h, w2, padding=1, ptype=jnp.int32)
        h = jnp.clip(h.astype(jnp.float32) * 0.001, 0, 127).astype(jnp.int8)
        h = conv(h, w3, ptype=jnp.int32)
        h = h.astype(jnp.float32) * 0.001 + x.astype(jnp.float32)
        return jnp.clip(h, 0, 127).astype(jnp.int8)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_int8(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.int32)

    print('devices:', jax.devices())
    t_b = timeit(block_bf16, xb, w1b, w2b, w3b)
    print(f'bottleneck bf16 XLA: {t_b*1e3:.2f} ms')
    t_8 = timeit(block_int8, x8, w18, w28, w38)
    print(f'bottleneck int8 XLA: {t_8*1e3:.2f} ms  ({t_b/t_8:.2f}x)')

    M = K = Nn = 8192
    a8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (K, Nn)), jnp.int8)
    ab = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    bb = jnp.asarray(rng.randn(K, Nn), jnp.bfloat16)
    t_mb = timeit(mm_bf16, ab, bb)
    fl = 2 * M * K * Nn
    print(f'matmul 8k bf16: {t_mb*1e3:.2f} ms = {fl/t_mb/1e12:.1f} TFLOP/s')
    t_m8 = timeit(mm_int8, a8, b8)
    print(f'matmul 8k int8: {t_m8*1e3:.2f} ms = {fl/t_m8/1e12:.1f} TOP/s')


if __name__ == '__main__':
    main()
