"""Smoke test for tools/zoo_parity.py — the one-command Table-3 parity
driver (reference README.md:53-81 zoo contract). The real zoo assets
are absent in this sandbox, so this drives run_one()'s EXACT wiring —
released-name .pth.tar -> convert_cli (full-depth released arch) ->
experiment config -> Tester eval — against a synthetic fixture, so any
predictor/Tester/config API drift breaks the suite instead of the
asset day (VERDICT r4 item 9)."""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'tools'))

from torch_ref import TorchResNetCls  # noqa: E402  (tests/torch_ref.py)
from instaorder_tpu.data.synthetic import make_instaorder_fixture  # noqa: E402


def test_zoo_parity_run_one_smoke(tmp_path):
    import zoo_parity

    # released-format checkpoint at the RELEASED full depth — the
    # conversion leg runs exactly what the zoo run will
    tm = TorchResNetCls(layers=(3, 4, 6, 3), in_channels=5,
                        num_classes=2)
    tm.eval()
    pth = str(tmp_path / 'InstaOrder_InstaOrderNet_o.pth.tar')
    torch.save({'step': 5, 'state_dict': {
        f'module.{k}': v for k, v in tm.state_dict().items()},
        'optimizer': {}}, pth)

    insta, _, img_dir = make_instaorder_fixture(
        str(tmp_path / 'fix'), n_images=2, n_instances=4)

    metrics = zoo_parity.run_one(
        pth, 'InstaOrderNet_o', 'InstaOrder/InstaOrderNet_o',
        str(tmp_path / 'out'), test_num=2,
        # fixture data + small eval resolution; arch/eval wiring stays
        # the released config's
        data_overrides={'val_image_root': img_dir,
                        'val_annot_file': insta,
                        'input_size': 64})
    assert {'recall', 'precision', 'f1'} <= set(metrics), metrics
    for v in metrics.values():
        assert np.isfinite(v)
    # converted checkpoint landed where a re-run would reuse it
    assert os.path.exists(
        str(tmp_path / 'out' / 'InstaOrder_InstaOrderNet_o.ckpt'))
