"""Test-only torch reference models replicating the torchvision structures
the reference wraps (classifier/model.py in SerezD/gen_adversarial), so that
converted checkpoints can be parity-checked without torchvision installed.
Nothing outside tests/ imports this."""

import torch
from torch import nn


class TVBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TVResNet(nn.Module):
    def __init__(self, layers, n_classes, groups=1, base_width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for stage, n in enumerate(layers):
            planes = 64 * (2 ** stage)
            blocks = []
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(TVBottleneck(inplanes, planes, stride, groups, base_width))
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        d = inplanes
        self.fc = nn.Sequential(nn.Linear(d, d, bias=False), nn.BatchNorm1d(d),
                                nn.ReLU(inplace=True), nn.Linear(d, n_classes))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TVVgg(nn.Module):
    def __init__(self, plan, n_classes):
        super().__init__()
        feats, in_ch = [], 3
        for item in plan:
            if item == "M":
                feats.append(nn.MaxPool2d(2, 2))
            else:
                feats += [nn.Conv2d(in_ch, item, 3, padding=1),
                          nn.BatchNorm2d(item), nn.ReLU(inplace=True)]
                in_ch = item
        self.features = nn.Sequential(*feats)
        self.avgpool = nn.AdaptiveAvgPool2d(7)
        d = in_ch * 49
        self.classifier = nn.Sequential(nn.Linear(d, d, bias=False), nn.BatchNorm1d(d),
                                        nn.ReLU(inplace=True), nn.Linear(d, n_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x)).flatten(1)
        return self.classifier(x)


class WrappedClassifier(nn.Module):
    """Reproduces the reference's `self.model = backbone` wrapper so state
    dict keys carry the 'model.' prefix (classifier/model.py:16,37,58)."""

    def __init__(self, backbone):
        super().__init__()
        self.model = backbone

    def forward(self, x):
        return self.model(x)


def numpy_state_dict(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
