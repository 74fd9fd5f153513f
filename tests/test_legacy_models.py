"""Legacy deocclusion components: shapes, semantics, torch parity for
PartialConv."""

import numpy as np
import torch
import torch.nn as tnn
import jax

from instaorder_tpu.models import legacy
from instaorder_tpu import losses as L


def test_ae_shapes():
    p, s, cfg = legacy.ae_init(jax.random.PRNGKey(0), in_channels=2, w=1,
                               latent_dim=32)
    x = np.zeros((2, 256, 256, 2), np.float32)
    out, _ = legacy.ae_apply(p, s, cfg, x)
    assert out.shape == (2, 256, 256, 2)


def test_vae_shapes_and_latent():
    p, s, cfg = legacy.ae_init(jax.random.PRNGKey(1), in_channels=2, w=1,
                               latent_dim=32, variational=True)
    x = np.zeros((2, 256, 256, 2), np.float32)
    (out, mean, logvar), _ = legacy.ae_apply(
        p, s, cfg, x, train=True, rng=jax.random.PRNGKey(2))
    assert out.shape == (2, 256, 256, 2)
    assert mean.shape == (2, 32) and logvar.shape == (2, 32)


def test_partial_conv_matches_torch_formula():
    """PartialConv renormalisation vs a direct torch port of
    pconv_unet.py:70-95."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 12, 12).astype(np.float32)
    mask = (rng.rand(1, 3, 12, 12) > 0.4).astype(np.float32)
    conv = tnn.Conv2d(3, 5, 3, 1, 1, bias=True)
    with torch.no_grad():
        out_t = conv(torch.from_numpy(x * mask))
        bias = conv.bias.view(1, -1, 1, 1).expand_as(out_t)
        mconv = tnn.Conv2d(3, 5, 3, 1, 1, bias=False)
        tnn.init.constant_(mconv.weight, 1.0)
        msum = mconv(torch.from_numpy(mask))
        holes = msum == 0
        msum = msum.masked_fill(holes, 1.0)
        want = ((out_t - bias) / msum + bias).masked_fill(holes, 0.0)
    p = {'w': conv.weight.detach().numpy().transpose(2, 3, 1, 0),
         'b': conv.bias.detach().numpy()}
    got, new_mask = legacy.partial_conv(
        p, x.transpose(0, 2, 3, 1), mask.transpose(0, 2, 3, 1), 1, 1)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)
    want_mask = (~holes.numpy()).astype(np.float32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(new_mask), want_mask)


def test_pconv_unet_forward():
    p, s, cfg = legacy.pconv_unet_init(jax.random.PRNGKey(3), layer_size=5,
                                       input_channels=3)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    mask = np.ones((1, 64, 64, 3), np.float32)
    mask[:, 20:40, 20:40, :] = 0
    (out, out_mask), _ = legacy.pconv_unet_apply(p, s, cfg, x, mask)
    assert out.shape == (1, 64, 64, 3)


def test_discriminators():
    p, s, cfg = legacy.inpaint_discriminator_init(jax.random.PRNGKey(4), 3)
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    (out, feats), ns = legacy.inpaint_discriminator_apply(p, s, cfg, x,
                                                          train=True)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
    # spectral norm: scaled weight has sigma_max ~1 after a few iters
    p2, s2, cfg2 = legacy.nlayer_discriminator_init(jax.random.PRNGKey(5),
                                                    3)
    out2, _ = legacy.nlayer_discriminator_apply(p2, s2, cfg2, x)
    assert out2.shape[0] == 2


def test_adversarial_loss_matches_torch():
    rng = np.random.RandomState(3)
    o = rng.rand(4, 1, 8, 8).astype(np.float32)  # sigmoid outputs
    want = tnn.BCELoss()(torch.from_numpy(o),
                         torch.ones(4, 1, 8, 8)).item()
    got = float(L.adversarial_loss(o, is_real=True, loss_type='nsgan'))
    assert abs(got - want) < 1e-6
    # hinge disc real: mean(relu(1 - o))
    want_h = torch.relu(1 - torch.from_numpy(o)).mean().item()
    got_h = float(L.adversarial_loss(o, True, is_disc=True,
                                     loss_type='hinge'))
    assert abs(got_h - want_h) < 1e-6


def test_inpainting_loss_terms():
    rng = np.random.RandomState(4)
    inp = rng.rand(1, 16, 16, 1).astype(np.float32)
    gt = rng.rand(1, 16, 16, 1).astype(np.float32)
    out = rng.rand(1, 16, 16, 1).astype(np.float32)
    mask = (rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32)

    def fake_extractor(img):
        return [img[:, ::2, ::2], img[:, ::4, ::4], img[:, ::8, ::8]]

    d = L.inpainting_loss(inp, mask, out, gt, fake_extractor)
    for k in ('hole', 'valid', 'prc', 'style', 'tv'):
        assert np.isfinite(float(d[k])), k


def test_gram_and_tv_match_torch():
    rng = np.random.RandomState(5)
    feat = rng.rand(2, 4, 4, 3).astype(np.float32)
    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    b, ch, h, w = tfeat.shape
    f = tfeat.view(b, ch, h * w)
    want = torch.bmm(f, f.transpose(1, 2)) / (ch * h * w)
    got = np.asarray(L.gram_matrix(feat))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)

    img = rng.rand(2, 5, 6, 3).astype(np.float32)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    want_tv = (torch.mean(torch.abs(timg[:, :, :, :-1] - timg[:, :, :, 1:]))
               + torch.mean(torch.abs(timg[:, :, :-1] - timg[:, :, 1:])))
    got_tv = float(L.total_variation_loss(img))
    assert abs(got_tv - want_tv.item()) < 1e-6


def test_vgg16_extractor():
    p, cfg = legacy.vgg16_extractor_init(jax.random.PRNGKey(6))
    x = np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32)
    feats = legacy.vgg16_extractor_apply(p, cfg, x)
    assert [f.shape for f in feats] == [(1, 32, 32, 64), (1, 16, 16, 128),
                                        (1, 8, 8, 256)]
    # wire into inpainting loss
    gt = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
    mask = np.ones((1, 64, 64, 1), np.float32)
    d = L.inpainting_loss(gt, mask, gt * 0.9, gt,
                          lambda img: legacy.vgg16_extractor_apply(p, cfg,
                                                                   img))
    assert np.isfinite(float(d['prc'])) and np.isfinite(float(d['style']))
