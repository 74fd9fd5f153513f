"""The driver artifacts must keep working (VERDICT r1 weak #1: the graft
entry shipped broken because nothing in tests/ imported it).

conftest.py already forces the 8-device virtual CPU backend, which is the
same recipe `dryrun_multichip` applies itself.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces_and_lowers():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    out = lowered.out_info
    assert out.shape == (8, 2)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_make_mesh_rejects_short_device_list():
    import pytest
    from instaorder_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match='truncated'):
        make_mesh(len(jax.devices()) + 1)
