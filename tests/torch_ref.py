"""Compact torch ResNet used only as a parity oracle in tests.

Built programmatically (torchvision-style layer naming so the production
weight converter can consume its state_dict); NOT part of the framework.
"""

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchResNetCls(nn.Module):
    """5-channel-in, single-or-dual-head ResNet oracle."""

    def __init__(self, layers=(3, 4, 6, 3), in_channels=5, num_classes=2,
                 groups=1, base_width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stage = []
            for bi in range(blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                stage.append(Bottleneck(cin, planes, stride, groups,
                                        base_width))
                cin = planes * 4
            setattr(self, f'layer{li + 1}', nn.Sequential(*stage))
        self.dual = isinstance(num_classes, (list, tuple))
        if self.dual:
            self.fc_occ = nn.Linear(cin, num_classes[0])
            self.fc_depth = nn.Linear(cin, num_classes[1])
        else:
            self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f'layer{li + 1}')(x)
        x = x.mean(dim=(2, 3))
        if self.dual:
            return self.fc_occ(x), self.fc_depth(x)
        return self.fc(x)


class TorchDoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    def forward(self, x):
        return self.conv(x)


class _Inc(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchDoubleConv(cin, cout)

    def forward(self, x):
        return self.conv(x)


class _Down(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.mpconv = nn.Sequential(nn.MaxPool2d(2),
                                    TorchDoubleConv(cin, cout))

    def forward(self, x):
        return self.mpconv(x)


class _Up(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchDoubleConv(cin, cout)

    def forward(self, x1, x2):
        x1 = nn.functional.interpolate(x1, scale_factor=2, mode='bilinear',
                                       align_corners=True)
        dy = x2.size(2) - x1.size(2)
        dx = x2.size(3) - x1.size(3)
        x1 = nn.functional.pad(x1, (dx // 2, dx - dx // 2,
                                    dy // 2, dy - dy // 2))
        return self.conv(torch.cat([x2, x1], dim=1))


class _OutC(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        return self.conv(x)


class TorchUNet(nn.Module):
    """Oracle for the 4-deep UNet (torchvision-free, reference-naming)."""

    def __init__(self, in_channels=3, w=4, n_classes=2):
        super().__init__()
        c = lambda m: int(m * w)
        self.inc = _Inc(in_channels, c(16))
        self.down1 = _Down(c(16), c(32))
        self.down2 = _Down(c(32), c(64))
        self.down3 = _Down(c(64), c(128))
        self.down4 = _Down(c(128), c(128))
        self.up1 = _Up(c(256), c(64))
        self.up2 = _Up(c(128), c(32))
        self.up3 = _Up(c(64), c(16))
        self.up4 = _Up(c(32), c(16))
        self.outc = _OutC(c(16), n_classes)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return self.outc(x)


class TorchRCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv2(torch.relu(self.conv1(torch.relu(x))))
        return out + x


class TorchFusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = TorchRCU(f)
        self.resConfUnit2 = TorchRCU(f)

    def forward(self, *xs):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        return nn.functional.interpolate(out, scale_factor=2,
                                         mode='bilinear', align_corners=True)


class TorchMidasOracle(nn.Module):
    """Compact MidasNet/InstaDepthNet oracle using the reference's exact
    state-dict naming (pretrained.layer1 = Sequential(conv1, bn1, relu,
    maxpool, layer1); scratch.layerN_rn; refinenets; output_conv;
    do_net/oo_net branch repacks + depth_fc/occ_fc)."""

    def __init__(self, trunk_layers=(1, 1, 1, 1),
                 branch_layers=(1, 1, 1, 1), features=32, variant='od',
                 groups=32, base_width=8):
        super().__init__()
        self.variant = variant

        def headless(in_ch, layers, g, bw):
            net = TorchResNetCls(layers, in_ch, 1, g, bw)
            body = nn.Module()
            body.layer1 = nn.Sequential(net.conv1, net.bn1, net.relu,
                                        net.maxpool, net.layer1)
            body.layer2 = net.layer2
            body.layer3 = net.layer3
            body.layer4 = net.layer4
            return body

        self.pretrained = headless(3, trunk_layers, groups, base_width)
        self.scratch = nn.Module()
        for i, cin in enumerate((256, 512, 1024, 2048), 1):
            setattr(self.scratch, f'layer{i}_rn',
                    nn.Conv2d(cin, features, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f'refinenet{i}', TorchFusion(features))
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, 128, 3, padding=1),
            nn.Identity(),  # placeholder: upsample applied in forward
            nn.Conv2d(128, 32, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(32, 1, 1), nn.ReLU(True))
        if variant == 'od':
            self.do_net = headless(2, branch_layers, 1, 64)
            self.oo_net = headless(2, branch_layers, 1, 64)
            self.depth_fc = nn.Linear(2048, 3)
            self.occ_fc = nn.Linear(2048, 2)

    def forward(self, img, mask1=None, mask2=None):
        l1 = self.pretrained.layer1(img)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        rn = [getattr(self.scratch, f'layer{i}_rn')(t)
              for i, t in enumerate((l1, l2, l3, l4), 1)]
        p4 = self.scratch.refinenet4(rn[3])
        p3 = self.scratch.refinenet3(p4, rn[2])
        p2 = self.scratch.refinenet2(p3, rn[1])
        p1 = self.scratch.refinenet1(p2, rn[0])
        oc = self.scratch.output_conv
        h = oc[0](p1)
        h = nn.functional.interpolate(h, scale_factor=2, mode='bilinear',
                                      align_corners=False)
        h2 = torch.relu(oc[2](h))
        disp = torch.relu(oc[4](h2))
        if self.variant != 'od':
            return disp.squeeze(1)
        x = torch.cat([mask1, mask2], dim=1)
        d1 = self.do_net.layer1(x)
        d2 = self.do_net.layer2(d1 + l1)
        d3 = self.do_net.layer3(d2 + l2)
        d4 = self.do_net.layer4(d3 + l3)
        depth = self.depth_fc(d4.mean(dim=(2, 3)))
        o1 = self.oo_net.layer1(x)
        o2 = self.oo_net.layer2(o1 + l1)
        o3 = self.oo_net.layer3(o2 + l2)
        o4 = self.oo_net.layer4(o3 + l3)
        occ = self.occ_fc(o4.mean(dim=(2, 3)))
        return disp.squeeze(1), depth, occ
