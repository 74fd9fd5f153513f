"""Native C++ RLE codec: build, bit-parity with the numpy codec, speed."""

import numpy as np
import pytest

from instaorder_tpu.data import rle
from instaorder_tpu import native


@pytest.fixture(scope='module')
def lib():
    lib = native.load(build_if_missing=True)
    if lib is None:
        pytest.skip('no C++ toolchain available')
    return lib


def blob(h, w, seed):
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    return (gaussian_filter(rng.rand(h, w), 4) > 0.5).astype(np.uint8)


def test_native_string_to_counts_matches_python(lib):
    for seed in range(5):
        m = blob(123, 217, seed)
        r = rle.encode(m)
        # python reference (bypass the registered native hook)
        py = rle._NATIVE.pop('string_to_counts')
        want = rle.string_to_counts(r['counts'])
        rle._NATIVE['string_to_counts'] = py
        got = native.string_to_counts(r['counts'].encode('ascii'))
        np.testing.assert_array_equal(got, want)


def test_native_decode_matches_python(lib):
    for seed in range(5):
        m = blob(200, 300, seed + 10)
        r = rle.encode(m)
        counts = rle.string_to_counts(r['counts'])
        got = native.decode_counts(counts, 200, 300)
        np.testing.assert_array_equal(got, m)


def test_native_encode_roundtrip(lib):
    m = blob(97, 131, 42)
    counts = native.encode_mask(m)
    np.testing.assert_array_equal(native.decode_counts(counts, 97, 131), m)


def test_registered_fast_path_used(lib):
    # once loaded, rle.decode routes through the native decode
    assert 'decode_counts' in rle._NATIVE
    m = blob(64, 64, 7)
    np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_native_is_faster(lib):
    import time
    m = blob(480, 640, 3)
    r = rle.encode(m)
    counts = rle.string_to_counts(r['counts'])

    t0 = time.perf_counter()
    for _ in range(50):
        native.decode_counts(counts, 480, 640)
    native_t = time.perf_counter() - t0

    dec = rle._NATIVE.pop('decode_counts')
    t0 = time.perf_counter()
    for _ in range(50):
        rle.decode(r)
    py_t = time.perf_counter() - t0
    rle._NATIVE['decode_counts'] = dec
    assert native_t < py_t  # typically 5-50x faster


def test_native_polygon_matches_python(lib):
    rng = np.random.RandomState(11)
    for trial in range(6):
        k = rng.randint(3, 9)
        poly = (rng.rand(2 * k) * np.array([120.0, 90.0] * k)).tolist()
        h, w = 90, 120
        # python reference (bypass the registered native hook)
        nat = rle._NATIVE.pop('polygon_to_counts')
        want = rle.from_polygon(poly, h, w)
        rle._NATIVE['polygon_to_counts'] = nat
        got = rle.from_polygon(poly, h, w)
        assert got['counts'] == want['counts'], f'trial {trial}'


def test_native_polygon_speed(lib):
    import time
    rng = np.random.RandomState(12)
    poly = (rng.rand(40) * 400).tolist()
    nat = rle._NATIVE.pop('polygon_to_counts')
    t0 = time.perf_counter()
    for _ in range(20):
        rle.from_polygon(poly, 480, 640)
    py_t = time.perf_counter() - t0
    rle._NATIVE['polygon_to_counts'] = nat
    t0 = time.perf_counter()
    for _ in range(20):
        rle.from_polygon(poly, 480, 640)
    nat_t = time.perf_counter() - t0
    assert nat_t < py_t
