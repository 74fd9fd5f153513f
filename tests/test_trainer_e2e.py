"""End-to-end Trainer/Tester over the synthetic InstaOrder fixture:
config -> train iterations -> checkpoint -> resume -> offline eval."""

import os
import types

import numpy as np
import pytest

from instaorder_tpu.data.synthetic import make_instaorder_fixture


@pytest.fixture(scope='module')
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    insta, instances, img_dir = make_instaorder_fixture(str(root))
    return {'root': str(root), 'insta': insta, 'img_dir': img_dir}


def make_args(fixture, total_iter=4, algo='InstaOrderNet_o'):
    args = types.SimpleNamespace()
    args.model = {
        'algo': algo, 'total_iter': total_iter,
        'lr_steps': [2], 'lr_mults': [0.1], 'lr': 1e-3,
        'weight_decay': 1e-4, 'optim': 'SGD',
        'warmup_lr': [], 'warmup_steps': [],
        'backbone_arch': 'resnet50_cls',
        'backbone_param': {'in_channels': 5, 'num_classes': 2,
                           'layers_override': (1, 1, 1, 1)},
        'use_rgb': True,
    }
    args.data = {
        'dataset': 'InstaOrder',
        'trainval_dataset': 'SupOcclusionOrderDataset',
        'train_image_root': fixture['img_dir'],
        'train_annot_file': fixture['insta'],
        'val_image_root': fixture['img_dir'],
        'val_annot_file': fixture['insta'],
        'input_size': 64, 'enlarge_box': 3.0,
        'base_aug': {'flip': True, 'shift': [-0.2, 0.2],
                     'scale': [0.8, 1.2]},
        'load_rgb': True, 'batch_size': 2, 'batch_size_val': 2,
        'workers': 2, 'patch_or_image': 'patch',
        'remove_occ_bidirec': 0, 'use_category': False,
        'data_mean': [0.485, 0.456, 0.406],
        'data_std': [0.229, 0.224, 0.225],
        'base_dir': fixture['root'],
    }
    args.trainer = {'initial_val': False, 'val_freq': 1000, 'val_iter': 2,
                    'print_freq': 2, 'save_freq': 1000,
                    'loss_record': ['loss'], 'exp_name': 'e2e_test'}
    args.seed = 0
    return args


def test_train_checkpoint_resume(fixture, tmp_path):
    from instaorder_tpu.train.trainer import Trainer

    args = make_args(fixture)
    out = str(tmp_path / 'run1')
    t = Trainer(args, n_devices=2, out_dir=out)
    # attribute contract relied on by cli/train.py --auto-resume
    assert t.folder == out
    t.train()
    assert t.curr_step == 4
    ckpts = os.listdir(os.path.join(out, 'checkpoints'))
    assert 'ckpt_iter_4.ckpt' in ckpts

    # resume from the checkpoint: start_iter recovered, params load
    t2 = Trainer(make_args(fixture, total_iter=6), n_devices=2,
                 out_dir=str(tmp_path / 'run2'))
    t2.load(os.path.join(out, 'checkpoints', 'ckpt_iter_4.ckpt'),
            resume=True)
    assert t2.start_iter == 4
    import jax
    a = jax.tree_util.tree_leaves(t.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    t2.train()
    assert t2.curr_step == 6
    val = t2.validate()
    assert np.isfinite(val['loss'])


def test_tensorboard_telemetry(fixture, tmp_path):
    """Config-gated tensorboardX hooks (reference trainer.py:59-66,
    185-193, 249-252): event files with train_/val_/lr scalars."""
    from instaorder_tpu.train.trainer import Trainer

    args = make_args(fixture, total_iter=2)
    args.trainer['tensorboard'] = True
    args.trainer['val_freq'] = 2
    out = str(tmp_path / 'tbrun')
    t = Trainer(args, n_devices=2, out_dir=out)
    t.train()
    t.summary.flush()
    ev_dir = os.path.join(out, 'events')
    files = os.listdir(ev_dir)
    assert any(f.startswith('events.out.tfevents') for f in files)
    # the scalars actually landed
    data = b''.join(open(os.path.join(ev_dir, f), 'rb').read()
                    for f in files)
    assert b'train_loss' in data and b'lr' in data and b'val_loss' in data


def test_wandb_config_offline_fallback(fixture, tmp_path):
    """`wandb: True` without the client (no egress here) captures the
    run in wandb's offline layout — run dir + history.jsonl +
    summary.json — instead of dropping the capability (reference
    trainer.py:54-58 wandb.init)."""
    import glob
    import json

    from instaorder_tpu.train.trainer import Trainer

    args = make_args(fixture)
    args.trainer['wandb'] = True
    t = Trainer(args, n_devices=2, out_dir=str(tmp_path / 'wb'))
    assert t.summary.active
    t.summary.scalar('train_loss', 1.5, 3)
    t.summary.close()
    runs = glob.glob(str(tmp_path / 'wb' / '**' / 'wandb' / 'run-*'),
                     recursive=True)
    assert len(runs) == 1
    hist = [json.loads(l) for l in
            open(os.path.join(runs[0], 'history.jsonl'))]
    assert hist and hist[-1]['train_loss'] == 1.5 and hist[-1]['_step'] == 3
    summary = json.load(open(os.path.join(runs[0], 'summary.json')))
    assert summary['train_loss'] == 1.5
    assert os.path.exists(os.path.join(runs[0], 'config.json'))


def test_offline_wandb_mixed_payload(tmp_path):
    """OfflineWandbRun.log accepts what the real client accepts —
    non-numeric values (strings, dicts) are JSON-stringified instead
    of raising (ADVICE r4: float(v) raised TypeError on them)."""
    import glob
    import json

    from instaorder_tpu.utils.telemetry import OfflineWandbRun

    r = OfflineWandbRun(str(tmp_path), name='mix', config={'a': 1})
    r.log({'loss': 2.0, 'note': 'hi', 'extra': {'k': [1, 2]}}, step=1)
    r.finish()
    run = glob.glob(str(tmp_path / 'wandb' / 'run-*'))[0]
    rec = json.loads(open(os.path.join(run, 'history.jsonl')).read())
    assert rec['loss'] == 2.0
    assert json.loads(rec['note']) == 'hi'
    assert json.loads(rec['extra']) == {'k': [1, 2]}


def test_tester_runs_occ(fixture, tmp_path):
    from instaorder_tpu.eval.tester import Tester

    args = make_args(fixture)
    args.order_method = ''
    args.pairs = 'all'
    args.zd = 0
    args.load_model = None
    tester = Tester(args)
    out = tester.run()
    assert set(out) >= {'recall', 'precision', 'f1'}
    assert np.isfinite(out['f1'])


def test_tester_disp_png_dump(fixture, tmp_path):
    """_dump_pngs(disp=...) writes the clipped-disparity artifact
    (reference tools/test.py:366-371) bicubic-upsampled to image size."""
    from instaorder_tpu.eval.tester import Tester

    args = make_args(fixture)
    args.order_method = 'area'
    args.out_dir = str(tmp_path / 'pngs')
    tester = Tester(args)
    image = np.zeros((48, 64, 3), np.uint8)
    modal = np.zeros((2, 48, 64), np.uint8)
    modal[0, 4:20, 4:30] = 1
    modal[1, 24:44, 30:60] = 1
    pred = np.array([[0, 1], [0, 0]])
    gt = np.array([[0, 1], [0, 0]])
    disp = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
    tester._dump_pngs('scene.png', image, modal, pred_depth=pred,
                      gt_depth=gt, gt_overlap=np.zeros((2, 2), int),
                      disp=disp)
    assert os.path.exists(os.path.join(args.out_dir, 'disp', 'scene.png'))


def test_tester_heuristics(fixture):
    from instaorder_tpu.eval.tester import Tester

    args = make_args(fixture)
    args.order_method = 'area'
    tester = Tester(args)
    out = tester.run()
    assert np.isfinite(out['f1'])


def test_visualize_helpers(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from instaorder_tpu.utils.visualize import (draw_graph,
                                                put_instance_mask_and_ID,
                                                get_mid_top_from_masks)
    order = np.array([[0, 1, 0], [0, 0, 2], [0, 2, 0]])
    ovl = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 0]])
    plt.figure()
    draw_graph(order, ovl)
    plt.savefig(tmp_path / 'g.png')
    plt.close('all')
    img = np.zeros((32, 32, 3), np.uint8)
    masks = np.zeros((2, 32, 32), np.uint8)
    masks[0, 2:12, 2:12] = 1
    masks[1, 10:22, 10:22] = 1
    overlay = put_instance_mask_and_ID(img, masks,
                                       get_mid_top_from_masks(masks))
    assert overlay.shape == (32, 32, 3)
    assert overlay.any()


def test_tester_pcnet_order_method(fixture):
    """PCNet-M erase-and-complete occlusion eval through the Tester
    (reference tools/test.py:434-439)."""
    args = make_args(fixture)
    args.model = {'algo': 'PartialCompletionMask',
                  'backbone_arch': 'unet1d2',
                  'backbone_param': {'in_channels': 2, 'n_classes': 2},
                  'use_rgb': False}
    args.data['trainval_dataset'] = 'PartialCompDataset'
    args.data['input_size'] = 32
    args.order_method = 'PartialCompletionMask'
    args.order_th = 0.1
    from instaorder_tpu.eval.tester import Tester
    t = Tester(args, n_images=2)
    out = t.run()
    assert np.isfinite(out['f1'])


def test_tester_heuristic_defaults_match_reference():
    """area occluder = 'larger' (tools/test.py:420-426), yaxis 'lower'
    for InstaOrder."""
    from instaorder_tpu.eval import tester as T
    masks = np.zeros((2, 20, 20), np.uint8)
    masks[0, 0:10, 0:20] = 1    # big, top
    masks[1, 9:13, 0:4] = 1     # small, below, touching 0
    args = types.SimpleNamespace()
    args.model = {'algo': 'InstaOrderNet_o'}
    args.data = {'dataset': 'InstaOrder', 'val_annot_file': None}
    # direct call of the dispatch helper without a reader
    t = object.__new__(T.Tester)
    t.order_method = 'area'
    t.dataset = 'InstaOrder'
    t.args = args
    pred = t._predict_occ(None, masks, None)
    assert pred[0, 1] == 1 and pred[1, 0] == 0  # larger occludes


def test_tester_depth_eval(fixture):
    """eval_depth_order through the Tester (SupDepthOrderDataset config):
    WHDR slices produced, area/yaxis heuristics also run."""
    args = make_args(fixture)
    args.model = {'algo': 'InstaOrderNet_d',
                  'backbone_arch': 'resnet50_cls',
                  'backbone_param': {'in_channels': 5, 'num_classes': 3,
                                     'layers_override': (1, 1, 1, 1)},
                  'use_rgb': True}
    args.data['trainval_dataset'] = 'SupDepthOrderDataset'
    args.order_method = ''
    from instaorder_tpu.eval.tester import Tester
    out = Tester(args, n_images=2).run()
    assert 'WHDR_ovlOX_all' in out and np.isfinite(out['WHDR_ovlOX_all'])

    for method in ('area', 'yaxis'):
        args2 = make_args(fixture)
        args2.data['trainval_dataset'] = 'SupDepthOrderDataset'
        args2.order_method = method
        out2 = Tester(args2, n_images=2).run()
        assert 'WHDR_ovlOX_all' in out2


def test_nan_loss_fails_fast(fixture, tmp_path):
    """Failure detection (SURVEY §5): a non-finite loss aborts the run
    with the step number rather than silently training garbage."""
    from instaorder_tpu.train.trainer import Trainer

    args = make_args(fixture, total_iter=2)
    args.trainer['print_freq'] = 1
    t = Trainer(args, n_devices=2, out_dir=str(tmp_path / 'nanrun'))
    real_step = t.train_step

    def poisoned(params, stats, opt_state, batch, lr):
        params, stats, opt_state, logs = real_step(params, stats,
                                                   opt_state, batch, lr)
        return params, stats, opt_state, {'loss': float('nan')}

    t.train_step = poisoned
    with pytest.raises(FloatingPointError, match='iter 1'):
        t.train()
