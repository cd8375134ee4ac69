"""Compact torch mirror of the reference DBNet+ for conversion-parity
tests (state_dict keys match yomitoku/models/dbnet_plus.py so
``convert_dbnet`` is validated against real checkpoint layouts).

Inference path only: binary head, no adaptive-threshold head."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride, padding=dilation, dilation=dilation, bias=False
        )
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(out + x)


class _ResNetBody(nn.Module):
    """resnet50 trunk with torchvision state_dict keys (conv1, bn1,
    layer{1-4}.{i}.*), replace_stride_with_dilation=[F, F, T]."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, blocks, stride, dil) in enumerate(
            ((64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 2, 1), (512, 3, 1, 2))
        ):
            mods = []
            for bi in range(blocks):
                # torchvision dilation rule: first block of the dilated
                # stage keeps the previous dilation (1), later blocks
                # dilate.
                d = 1 if (dil > 1 and bi == 0) else dil
                mods.append(
                    _Bottleneck(
                        inplanes if bi == 0 else planes * 4,
                        planes,
                        stride=stride if bi == 0 else 1,
                        dilation=d,
                        downsample=bi == 0,
                    )
                )
            inplanes = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        feats = {}
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            feats[f"layer{i}"] = x
        return feats


class _Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = _ResNetBody()

    def forward(self, x):
        return self.body(x)


class _Attention(nn.Module):
    """ScaleChannelSpatialAttention (dbnet_feature_attention.py:36-81)."""

    def __init__(self, in_planes, out_planes, num_features):
        super().__init__()
        self.channel_wise = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_planes, out_planes, 1, bias=False),
            nn.ReLU(),
            nn.Conv2d(out_planes, in_planes, 1, bias=False),
        )
        self.spatial_wise = nn.Sequential(
            nn.Conv2d(1, 1, 3, bias=False, padding=1),
            nn.ReLU(),
            nn.Conv2d(1, 1, 1, bias=False),
            nn.Sigmoid(),
        )
        self.attention_wise = nn.Sequential(
            nn.Conv2d(in_planes, num_features, 1, bias=False), nn.Sigmoid()
        )

    def forward(self, x):
        g = self.channel_wise(x).sigmoid() + x
        g = self.spatial_wise(torch.mean(g, dim=1, keepdim=True)) + g
        return self.attention_wise(g)


class _ScaleFeatureSelection(nn.Module):
    def __init__(self, in_channels, inter_channels, out_features_num=4):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, inter_channels, 3, padding=1)
        self.enhanced_attention = _Attention(
            inter_channels, inter_channels // 4, out_features_num
        )
        self.out_features_num = out_features_num

    def forward(self, concat_x, features_list):
        score = self.enhanced_attention(self.conv(concat_x))
        return torch.cat(
            [score[:, i : i + 1] * features_list[i]
             for i in range(self.out_features_num)],
            dim=1,
        )


class _Decoder(nn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), hidden_dim=256):
        super().__init__()
        d = hidden_dim
        self.input_proj = nn.ModuleDict(
            {
                f"layer{i + 1}": nn.Conv2d(c, d, 1, bias=False)
                for i, c in enumerate(in_channels)
            }
        )
        up = lambda s: nn.Upsample(scale_factor=s, mode="bilinear", align_corners=False)
        c3 = lambda: nn.Conv2d(d, d // 4, 3, padding=1, bias=False)
        self.out_proj = nn.ModuleDict(
            {
                "layer1": c3(),
                "layer2": nn.Sequential(c3(), up(2)),
                "layer3": nn.Sequential(c3(), up(4)),
                "layer4": nn.Sequential(c3(), up(4)),
            }
        )
        self.binarize = nn.Sequential(
            nn.Conv2d(d, d // 4, 3, padding=1, bias=False),
            nn.BatchNorm2d(d // 4),
            nn.ReLU(inplace=True),
            nn.ConvTranspose2d(d // 4, d // 4, 2, 2),
            nn.BatchNorm2d(d // 4),
            nn.ReLU(inplace=True),
            nn.ConvTranspose2d(d // 4, 1, 2, 2),
            nn.Sigmoid(),
        )
        self.concat_attention = _ScaleFeatureSelection(d, d // 4)

    def forward(self, feats):
        p = {k: self.input_proj[k](v) for k, v in feats.items()}
        order = ["layer4", "layer3", "layer2", "layer1"]
        for i in range(3):
            bottom, top = p[order[i]], p[order[i + 1]]
            if bottom.shape[-2:] != top.shape[-2:]:
                bottom = F.interpolate(
                    bottom, size=top.shape[-2:], mode="bilinear", align_corners=False
                )
            p[order[i + 1]] = bottom + top
        fp = [self.out_proj[k](p[k]) for k in ("layer1", "layer2", "layer3", "layer4")]
        fuse = torch.cat(fp[::-1], dim=1)
        fuse = self.concat_attention(fuse, fp[::-1])
        return self.binarize(fuse)


class DBNetTorch(nn.Module):
    def __init__(self, hidden_dim=256):
        super().__init__()
        self.backbone = _Backbone()
        self.decoder = _Decoder(hidden_dim=hidden_dim)

    @torch.no_grad()
    def forward(self, x):
        return self.decoder(self.backbone(x))
