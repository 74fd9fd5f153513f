"""DIW / dense-depth eval driver tests with synthetic readers."""

import numpy as np

from instaorder_tpu.eval import disp as D


class FakeDIWReader:
    """Two samples with known ordinal answers for a controllable
    'disparity' model."""

    def __init__(self):
        self.samples = []
        for i, (a, b, ordinal) in enumerate(
                [((10, 10), (50, 50), '<'),   # A closer (bigger disp)
                 ((60, 20), (20, 60), '>')]):
            img = np.zeros((100, 120, 3), np.uint8)
            chw = np.zeros((3, 384, 384), np.float32)
            self.samples.append((img, chw, [list(a), list(b), ordinal],
                                 f'img{i}'))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def gradient_disp_forward(x):
    """Disparity decreasing along y: pixels with smaller y are closer."""
    h = w = 384
    gy = np.linspace(1.0, 0.0, h, dtype=np.float32)
    return np.tile(gy[None, :, None], (x.shape[0], 1, w))


def test_eval_diw_whdr():
    reader = FakeDIWReader()
    out = D.eval_diw(gradient_disp_forward, reader, log=lambda *a: None)
    # sample 0: A at y=10 -> bigger disp than B at y=50 -> pred '<' correct
    # sample 1: A at y=60 -> smaller disp than B at y=20 -> pred '>' correct
    assert out['whdr'] == 0.0 and out['n'] == 2


def test_eval_diw_counts_errors():
    reader = FakeDIWReader()
    reader.samples[0] = (reader.samples[0][0], reader.samples[0][1],
                         [[10, 10], [50, 50], '>'], 'x')  # wrong gt
    out = D.eval_diw(gradient_disp_forward, reader, log=lambda *a: None)
    assert out['whdr'] == 50.0


class FakeKITTIReader:
    def __init__(self, n=2):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        chw = np.zeros((3, 352, 1216), np.float32)
        return chw, f'img{i}.png', f'depth{i}.png'


def test_eval_dense_depth_perfect_when_aligned():
    # constant-depth scene: gt = 5m everywhere; any constant disparity
    # median-scales exactly onto it
    gt = np.full((352 + 10, 1216 + 8), 5.0, np.float32)

    def read_gt(name):
        return gt

    def fwd(x):
        return np.full((x.shape[0], 352, 1216), 0.7, np.float32)

    out = D.eval_dense_depth(fwd, FakeKITTIReader(), 'kitti',
                             read_gt_depth=read_gt, log=lambda *a: None)
    assert out['n'] == 2
    assert abs(out['abs_rel']) < 1e-6
    assert out['d1'] == 1.0


def test_eval_dense_depth_saves_debug_artifacts(tmp_path):
    """save_dir writes the reference's per-image artifacts: depth
    histogram, pred/gt disparity and rgb imsaves
    (test_disp_KITTI.py:205-231)."""
    import os
    gt = np.full((352 + 10, 1216 + 8), 5.0, np.float32)

    def read_gt(name):
        return gt

    def fwd(x):
        return np.full((x.shape[0], 352, 1216), 0.7, np.float32)

    out = D.eval_dense_depth(fwd, FakeKITTIReader(1), 'kitti',
                             read_gt_depth=read_gt, log=lambda *a: None,
                             save_dir=str(tmp_path))
    assert out['n'] == 1
    assert os.path.exists(tmp_path / 'distribution' / 'depth' / 'img0.png')
    # pred_disp filename carries the d1 percentage (here 100.00)
    assert os.path.exists(tmp_path / 'pred_disp' / 'img0_100.00.png')
    assert os.path.exists(tmp_path / 'gt_disp' / 'img0.png')
    assert os.path.exists(tmp_path / 'rgb' / 'img0.png')


def test_eval_dense_depth_missing_gt():
    def read_gt(name):
        return None

    def fwd(x):
        return np.zeros((x.shape[0], 352, 1216), np.float32)

    out = D.eval_dense_depth(fwd, FakeKITTIReader(), 'kitti',
                             read_gt_depth=read_gt, log=lambda *a: None)
    assert out['n'] == 0
