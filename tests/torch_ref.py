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
