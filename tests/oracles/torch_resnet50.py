"""Torch oracle: torchvision-style ResNet50 (state_dict names match
torchvision exactly), used ONLY to prove
flocoder_tpu.models.perceptual.convert_torch_resnet50 + ResNet50Logits
numerics (torchvision is not installed here). Reference behavior:
flocoder/metrics.py:119-142 / vqgan_plus.py:232-257 (ResNet50 logits
perceptual loss)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, width, stride=1):
        super().__init__()
        out_ch = width * self.expansion
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        identity = self.downsample(x) if self.downsample else x
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + identity)


class ResNet50(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for li, (blocks, width) in enumerate([(3, 64), (4, 128),
                                              (6, 256), (3, 512)]):
            layer = []
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 0) else 1
                layer.append(Bottleneck(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)
