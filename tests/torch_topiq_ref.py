"""Independent torch mirror of models/topiq.py's CFANet, used as the golden
oracle for the converter + forward parity tests (same role as
tests/torch_yolo_ref.py for the YOLO converter). Attribute names define the
state_dict layout ``convert_topiq_torch`` consumes."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBottleneck(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        width = cout // 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.has_down = cin != cout or stride != 1
        if self.has_down:
            self.down_conv = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.down_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.has_down:
            x = self.down_bn(self.down_conv(x))
        return F.relu(x + y)


class TorchBackbone(nn.Module):
    def __init__(self, stage_channels, stage_depths):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(64)
        cin = 64
        self.stage_depths = stage_depths
        for s, (ch, depth) in enumerate(zip(stage_channels, stage_depths)):
            for b in range(depth):
                stride = 2 if (b == 0 and s > 0) else 1
                setattr(self, f"layer{s + 1}_{b}", TorchBottleneck(cin, ch, stride))
                cin = ch

    def forward(self, x):
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for s, depth in enumerate(self.stage_depths):
            for b in range(depth):
                x = getattr(self, f"layer{s + 1}_{b}")(x)
            outs.append(x)
        return outs


class TorchAttnBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm_q = nn.LayerNorm(dim)
        self.norm_kv = nn.LayerNorm(dim)
        self.norm_mlp = nn.LayerNorm(dim)
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, q, kv=None):
        kv_in = q if kv is None else kv
        h = self.norm_q(q)
        hk = self.norm_kv(kv_in)
        x = q + self.attn(h, hk, hk, need_weights=False)[0]
        y = self.fc2(F.gelu(self.fc1(self.norm_mlp(x))))
        return x + y


class TorchCFANet(nn.Module):
    def __init__(self, embed_dim=256, heads=4, num_attn_blocks=1,
                 mlp_ratio=4.0, stage_channels=(256, 512, 1024, 2048),
                 stage_depths=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = TorchBackbone(stage_channels, stage_depths)
        self.n_scales = len(stage_channels)
        self.num_attn_blocks = num_attn_blocks
        for i, ch in enumerate(stage_channels):
            setattr(self, f"reduce{i}", nn.Conv2d(ch, embed_dim, 1))
            self.register_parameter(
                f"scale_embed{i}", nn.Parameter(torch.randn(embed_dim) * 0.02)
            )
        for j in range(num_attn_blocks):
            setattr(self, f"self{j}", TorchAttnBlock(embed_dim, heads, mlp_ratio))
        for i in range(self.n_scales - 1):
            setattr(self, f"cross{i}", TorchAttnBlock(embed_dim, heads, mlp_ratio))
        self.head_fc1 = nn.Linear(embed_dim, embed_dim)
        self.head_fc2 = nn.Linear(embed_dim, 1)

    def forward(self, x):  # x [B,3,H,W] in [0,1]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        feats = self.backbone(x)
        gh = feats[-1].shape[2]
        tokens = []
        for i, f in enumerate(feats):
            r = getattr(self, f"reduce{i}")(f)
            fh = f.shape[2] // gh
            if fh > 1:
                r = F.avg_pool2d(r, fh, fh)
            t = r.flatten(2).transpose(1, 2)  # [B, N, D]
            tokens.append(t + getattr(self, f"scale_embed{i}"))
        stream = tokens[-1]
        for j in range(self.num_attn_blocks):
            stream = getattr(self, f"self{j}")(stream)
        for i in range(self.n_scales - 2, -1, -1):
            stream = getattr(self, f"cross{i}")(tokens[i], kv=stream)
        pooled = stream.mean(dim=1)
        h = F.gelu(self.head_fc1(pooled))
        return torch.sigmoid(self.head_fc2(h)[..., 0])
