"""Dense disparity/depth evaluation drivers (DIW ordinal + KITTI/NYU).

Parity targets:
  DIW single-point WHDR      <- tools/test_disp_DIW.py:105-168
  KITTI/NYU dense metrics    <- tools/test_disp_KITTI.py:125-239
    (median disparity->depth scaling, depth clipped to [min, max])

The disparity forward (MidasNet or InstaDepthNet with zero masks) runs
batched+jitted; GT readback and metric accumulation stay on host.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..ops.resize import resize_weights_linear
from .metrics import compute_errors


def _disp_forward_fn(apply_fn, cfg, params, stats, algo):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(image_nhwc):
        if algo == 'midas_pretrained' or cfg.get('variant') == 'midas':
            disp, _ = apply_fn(params, stats, cfg, image_nhwc, train=False)
        else:
            zeros = jnp.zeros(image_nhwc.shape[:3], image_nhwc.dtype)
            (disp, _, _), _ = apply_fn(params, stats, cfg, image_nhwc,
                                       zeros, zeros, train=False)
        return disp

    return fwd


def _upsample_half_pixel_np(disp, out_h, out_w):
    """torch bilinear align_corners=False resize of an (H, W) map."""
    Wy = resize_weights_linear(disp.shape[0], out_h)
    Wx = resize_weights_linear(disp.shape[1], out_w)
    return Wy @ disp @ Wx.T


def eval_diw(forward, reader, n_samples=-1, log=print):
    """DIW ordinal WHDR: predict disparity on the 384^2 resize, upsample
    bilinearly to the original image, compare at the two annotated pixels
    (larger disparity = closer; 'disparity ordinal' is the opposite of
    'depth ordinal', test_disp_DIW.py:137-147).

    forward: (1, 384, 384, 3) normalized NHWC -> (1, h, w) disparity.
    Returns {'whdr': %, 'n': count}."""
    n = len(reader) if n_samples == -1 else min(len(reader), n_samples)
    errors = []
    for i in range(n):
        img_orig, image_chw, (a_yx, b_yx, ordinal), fn = reader[i]
        disp = np.asarray(forward(
            image_chw.transpose(1, 2, 0)[None]))[0]
        disp = _upsample_half_pixel_np(disp, img_orig.shape[0],
                                       img_orig.shape[1])
        da = disp[a_yx[0], a_yx[1]]
        db = disp[b_yx[0], b_yx[1]]
        pred = '<' if da > db else ('>' if da < db else '=')
        errors.append(int(pred != ordinal))
    whdr = float(np.sum(errors) / max(len(errors), 1) * 100)
    log(f'computed error on {len(errors)}')
    log(f'wrong/all = {int(np.sum(errors))}/{len(errors)}')
    log(f'WHDR = {whdr}')
    return {'whdr': whdr, 'n': len(errors)}


def eval_dense_depth(forward, reader, dataset='kitti', n_samples=-1,
                     read_gt_depth=None, log=print,
                     save_dir=None) -> Dict[str, float]:
    """KITTI/NYU: disparity -> min-max norm -> depth = 1/(disp+1e-3) ->
    median scaling vs GT -> clip [min_depth, max_depth] -> 8 metrics
    (test_disp_KITTI.py:171-239).

    read_gt_depth(depth_name) -> float32 HxW depth in meters (0 =
    missing); defaults to the KITTI uint16/256 PNG convention.

    save_dir: when set, writes the reference's per-image debug
    artifacts (test_disp_KITTI.py:205-231): depth histogram under
    distribution/depth/, pred_disp/{img}_{d1:.2f}.png, gt_disp/ and the
    un-normalized rgb/ (all cmap inferno except rgb)."""
    import cv2

    min_depth, max_depth = (1e-3, 80.0) if dataset == 'kitti' else (1e-3,
                                                                    10.0)
    if read_gt_depth is None:
        def read_gt_depth(name):
            raw = cv2.imread(name, -1)
            if raw is None:
                return None
            return raw.astype(np.float32) / 256.0

    n = len(reader) if n_samples == -1 else min(len(reader), n_samples)
    errors = []
    missing = 0
    for i in range(n):
        image_chw, img_name, depth_name = reader[i]
        gt_depth = read_gt_depth(depth_name)
        if gt_depth is None:
            missing += 1
            continue
        if dataset == 'kitti':
            top = int(gt_depth.shape[0] - 352)
            left = int((gt_depth.shape[1] - 1216) / 2)
            gt_depth = gt_depth[top:top + 352, left:left + 1216]
        disp = np.asarray(forward(image_chw.transpose(1, 2, 0)[None]))[0]
        norm = (disp - disp.min()) / disp.max()
        pred_depth = 1.0 / (norm + 1e-3)
        valid = (gt_depth >= min_depth) & (gt_depth <= max_depth)
        if not valid.any():
            missing += 1
            continue
        ratio = np.median(gt_depth[valid]) / np.median(pred_depth[valid])
        pred_depth = pred_depth * ratio
        if save_dir is not None:
            # histogram of the scaled (pre-clip) depths, 50 gray bins
            # (test_disp_KITTI.py:209-215)
            _save_depth_hist(save_dir, img_name, pred_depth[valid])
        pred_depth = np.clip(pred_depth, min_depth, max_depth)
        err = compute_errors(gt_depth[valid], pred_depth[valid])
        errors.append(err)
        if save_dir is not None:
            _save_disp_pngs(save_dir, img_name, disp, gt_depth,
                            image_chw, err['d1'] * 100.0)
    log(f'computed error on {len(errors)} / {missing} missing')
    if not errors:
        return {'n': 0}
    keys = errors[0].keys()
    out = {k: float(np.mean([e[k] for e in errors])) for k in keys}
    out['n'] = len(errors)
    header = ('{:>8} | ' * 8).format('abs_rel', 'sq_rel', 'rmse',
                                     'rmse_log', 'd1', 'd2', 'd3', 'silog')
    vals = ('{: 8.3f}  ' * 8).format(
        out['abs_rel'], out['sq_rel'], out['rmse'], out['rmse_log'],
        out['d1'], out['d2'], out['d3'], out['silog'])
    log('\n  ' + header)
    log(vals)
    return out


def _save_depth_hist(save_dir, img_name, depths):
    import os
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    name = os.path.splitext(os.path.basename(img_name))[0]
    d = os.path.join(save_dir, 'distribution', 'depth')
    os.makedirs(d, exist_ok=True)
    plt.hist(depths, color='gray', edgecolor='black', bins=50)
    plt.title('Histogram of pred_depth[mask_valid]')
    plt.xlabel('depth')
    plt.ylabel('distribution')
    plt.savefig(os.path.join(d, f'{name}.png'))
    plt.close('all')


def _save_disp_pngs(save_dir, img_name, pred_disp, gt_depth, image_chw,
                    d1_pct):
    """pred/gt disparity + un-normalized rgb imsaves
    (test_disp_KITTI.py:224-231)."""
    import os
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from ..utils.midas_io import unnormalize
    name = os.path.splitext(os.path.basename(img_name))[0]
    for sub in ('pred_disp', 'gt_disp', 'rgb'):
        os.makedirs(os.path.join(save_dir, sub), exist_ok=True)
    plt.imsave(os.path.join(save_dir, 'pred_disp',
                            f'{name}_{d1_pct:.2f}.png'),
               pred_disp, cmap='inferno')
    gt_disp = 1.0 / (gt_depth + 1e-3)
    gt_disp[gt_depth == 0] = 0
    plt.imsave(os.path.join(save_dir, 'gt_disp', f'{name}.png'),
               gt_disp, cmap='inferno')
    rgb = unnormalize(image_chw)
    plt.imsave(os.path.join(save_dir, 'rgb', f'{name}.png'),
               np.clip(rgb, 0.0, 1.0).transpose(1, 2, 0))


def make_disp_forward(algo, load_model=None, features=256):
    """Build the jitted disparity forward for an eval driver.
    algo: 'midas_pretrained' | 'InstaDepthNet_d' | 'InstaDepthNet_od'."""
    import jax
    from ..models import midas
    from ..core import checkpoint as ckpt

    variant = {'midas_pretrained': 'midas',
               'InstaDepthNet_d': 'instadepthnet_d',
               'InstaDepthNet_od': 'instadepthnet_od'}[algo]
    params, stats, cfg = midas.init(jax.random.PRNGKey(0),
                                    features=features, variant=variant)
    if load_model:
        if load_model.endswith(('.pt', '.pth.tar', '.pth')):
            from ..compat.torch_convert import convert_checkpoint
            params, stats, _ = convert_checkpoint(load_model, cfg, 'midas')
        else:
            _, params, stats, _ = ckpt.load_state(load_model, params, stats)
    return _disp_forward_fn(midas.apply, cfg, params, stats, algo)
