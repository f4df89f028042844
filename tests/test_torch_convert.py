"""Golden parity: torch-layout state_dicts → converted flax params reproduce
torch logits (reference transfer-learning path: timm hub weights loaded at
/root/reference/train.py:194 with utils.py:584-595 pruning).

The torch mirrors below replicate the exact module/naming layout of
torchvision ResNet, facebookresearch ConvNeXt, and timm ViT so their
state_dicts look like real hub downloads (random weights, randomized BN
running stats)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imageclassification_tpu.checkpoint.io import (  # noqa: E402
    _unflatten_like,
    load_params_with_pruning,
)
from imageclassification_tpu.checkpoint.torch_convert import (  # noqa: E402
    convert_state_dict,
)
from imageclassification_tpu.models import create_model  # noqa: E402


def _flax_logits(model_name, sd, x_nchw, num_classes):
    model = create_model(model_name, num_classes=num_classes)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    flat_params, flat_stats = convert_state_dict(sd, model_name)
    params = _unflatten_like(variables["params"], flat_params)
    v = {"params": params}
    if "batch_stats" in variables:
        v["batch_stats"] = _unflatten_like(variables["batch_stats"], flat_stats)
    # every converted tensor must land (name AND shape) — no silent drops
    _, missing = load_params_with_pruning(
        variables["params"], flat_params, verbose=True
    )
    assert missing == 0, f"{missing} converted tensors did not match the model"
    return np.asarray(model.apply(v, x, train=False))


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.uniform_(0.6, 1.4)
                m.bias.uniform_(-0.2, 0.2)


# ------------------------------------------------------------ torch ResNet --


class _TorchBasic(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


class _TorchResNet(tnn.Module):
    def __init__(self, block, stages, num_classes, expansion):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n in enumerate(stages):
            planes = 64 * 2 ** i
            blocks = []
            for j in range(n):
                stride = 2 if i > 0 and j == 0 else 1
                blocks.append(block(cin, planes, stride))
                cin = planes * expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.fc(x.mean(dim=(2, 3)))


import functools  # noqa: E402

@pytest.mark.parametrize("name,block,stages,exp", [
    ("resnet18", _TorchBasic, [2, 2, 2, 2], 1),
    ("resnet50", _TorchBottleneck, [3, 4, 6, 3], 4),
    ("resnext50_32x4d",
     functools.partial(_TorchBottleneck, groups=32, base_width=4),
     [3, 4, 6, 3], 4),
    ("wide_resnet50_2",
     functools.partial(_TorchBottleneck, base_width=128),
     [3, 4, 6, 3], 4),
])
def test_resnet_torch_parity(name, block, stages, exp):
    torch.manual_seed(0)
    net = _TorchResNet(block, stages, num_classes=7, expansion=exp).eval()
    _randomize_bn(net)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits(name, net.state_dict(), x.numpy(), num_classes=7)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------- torch ConvNeXt --


class _LNChannelsFirst(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(dim))
        self.bias = tnn.Parameter(torch.zeros(dim))

    def forward(self, x):  # [B, C, H, W]
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class _FBBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, 4 * dim)
        self.act = tnn.GELU()
        self.pwconv2 = tnn.Linear(4 * dim, dim)
        self.gamma = tnn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        s = x
        x = self.dwconv(x).permute(0, 2, 3, 1)
        x = self.pwconv2(self.act(self.pwconv1(self.norm(x))))
        x = (self.gamma * x).permute(0, 3, 1, 2)
        return s + x


class _FBConvNeXt(tnn.Module):
    """facebookresearch/ConvNeXt layout (the reference's vendored backbone)."""

    def __init__(self, depths, dims, num_classes, block=None):
        super().__init__()
        block = block or _FBBlock
        self.downsample_layers = tnn.ModuleList()
        self.downsample_layers.append(tnn.Sequential(
            tnn.Conv2d(3, dims[0], 4, 4), _LNChannelsFirst(dims[0])
        ))
        for i in range(3):
            self.downsample_layers.append(tnn.Sequential(
                _LNChannelsFirst(dims[i]),
                tnn.Conv2d(dims[i], dims[i + 1], 2, 2),
            ))
        self.stages = tnn.ModuleList(
            tnn.Sequential(*[block(dims[i]) for _ in range(depths[i])])
            for i in range(4)
        )
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
        return self.head(self.norm(x.mean([-2, -1])))


def test_convnext_torch_parity():
    torch.manual_seed(1)
    net = _FBConvNeXt((2, 2, 6, 2), (40, 80, 160, 320), num_classes=5).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("convnext_atto", net.state_dict(), x.numpy(), num_classes=5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- torch ViT --


class _TimmAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        x = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TimmBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.act = tnn.GELU()
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))


class _TimmViT(tnn.Module):
    def __init__(self, img, patch, dim, depth, heads, num_classes):
        super().__init__()
        n = (img // patch) ** 2 + 1
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.blocks = tnn.ModuleList(
            _TimmBlock(dim, heads) for _ in range(depth)
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def test_vit_torch_parity():
    torch.manual_seed(2)
    net = _TimmViT(64, 16, 192, 12, 3, num_classes=6).eval()  # tiny: depth 12
    with torch.no_grad():  # non-trivial cls token
        net.cls_token.normal_(0, 0.02)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("vit_tiny_patch16", net.state_dict(), x.numpy(),
                       num_classes=6)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


def test_convert_prunes_foreign_head(tmp_path):
    """BASELINE config 4 semantics: foreign weights with a different head size
    load through the pruning path (utils.py:584-595 prints per drop)."""
    torch.manual_seed(3)
    net = _TorchResNet(_TorchBasic, [2, 2, 2, 2], num_classes=1000, expansion=1)
    flat, stats = convert_state_dict(net.state_dict(), "resnet18")

    model = create_model("resnet18", num_classes=4)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=False,
    )
    new_params, missing = load_params_with_pruning(variables["params"], flat)
    assert missing == 2  # head kernel + bias dropped (1000 vs 4 classes)
    # backbone did load: stem kernel equals the converted torch tensor
    got = np.asarray(
        jax.tree_util.tree_leaves_with_path(new_params)[0][1]
    )
    assert np.isfinite(got).all()


def test_convert_unwraps_containers_and_module_prefix():
    """Real-world checkpoint files wrap the state_dict ('state_dict'/'model')
    and DDP training prefixes keys with 'module.' — both must unwrap."""
    torch.manual_seed(4)
    net = _TorchResNet(_TorchBasic, [2, 2, 2, 2], num_classes=3, expansion=1)
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    wrapped = {"state_dict": sd, "epoch": 7}
    flat, stats = convert_state_dict(wrapped, "resnet18")
    assert "conv_stem/kernel" in flat and "bn_stem/mean" in stats
    assert flat["head/bias"].shape == (3,)


def test_convert_torch_checkpoint_file_roundtrip(tmp_path):
    """File-level tool: torch.save'd state_dict → repo checkpoint consumable
    by load_checkpoint + pruning."""
    from imageclassification_tpu.checkpoint.io import load_checkpoint
    from imageclassification_tpu.checkpoint.torch_convert import (
        convert_torch_checkpoint,
    )

    torch.manual_seed(5)
    net = _TorchResNet(_TorchBasic, [2, 2, 2, 2], num_classes=6, expansion=1)
    src = tmp_path / "torch_r18.pth"
    torch.save(net.state_dict(), src)
    out = convert_torch_checkpoint(str(src), "resnet18", str(tmp_path / "o.pth"))
    ck = load_checkpoint(out)
    assert ck["model_spec"] == {"name": "resnet18",
                                "kwargs": {"num_classes": 6}}
    assert ck["num_classes"] == 6  # inferred from the head
    model = create_model("resnet18", num_classes=6)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=False,
    )
    _, missing = load_params_with_pruning(variables["params"], ck["model"])
    assert missing == 0


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="no torch converter"):
        convert_state_dict({}, "inception_v3")


def test_resample_pos_embed():
    """ViT pos_embed grid resampling (timm resample_abs_pos_embed semantics
    for pretrained loads at a non-source --input_size)."""
    from imageclassification_tpu.checkpoint.torch_convert import (
        resample_pos_embed,
    )

    rng = np.random.default_rng(0)
    d = 8
    src = {"pos_embed": rng.normal(size=(1, 1 + 14 * 14, d)).astype(np.float32),
           "other": np.ones(3, np.float32)}
    tgt = {"pos_embed": np.zeros((1, 1 + 7 * 7, d), np.float32)}
    out = resample_pos_embed(src, tgt)
    assert out["pos_embed"].shape == (1, 50, d)
    # cls token passes through untouched
    np.testing.assert_array_equal(out["pos_embed"][:, 0], src["pos_embed"][:, 0])
    # grid values stay in the convex-ish hull of the source (bicubic can
    # overshoot slightly; just check finiteness + rough range)
    assert np.isfinite(out["pos_embed"]).all()
    # constant grid resamples to the same constant
    const = dict(src)
    const["pos_embed"] = np.concatenate(
        [np.full((1, 1, d), 5.0, np.float32),
         np.full((1, 196, d), 2.0, np.float32)], axis=1
    )
    out2 = resample_pos_embed(const, tgt)
    np.testing.assert_allclose(out2["pos_embed"][:, 1:], 2.0, atol=1e-5)
    # same shape → untouched (identity), non-square grids → untouched
    assert resample_pos_embed(src, {"pos_embed": src["pos_embed"]}) is src
    odd = {"pos_embed": np.zeros((1, 1 + 13, d), np.float32)}
    assert resample_pos_embed(src, odd) is src
    # upsampling works too and feeds the pruning path with a matching shape
    up = {"pos_embed": np.zeros((1, 1 + 16 * 16, d), np.float32)}
    assert resample_pos_embed(src, up)["pos_embed"].shape == (1, 257, d)


# ----------------------------------------------- MSRA EfficientViT mirror --
# Replicates microsoft/Cream EfficientViT (the hub layout timm's
# efficientvit_m* checkpoints are filtered from): Conv2d_BN as Sequential
# (c, bn), Residual wrapper attr m, FFN pw1/pw2, CascadedGroupAttention
# qkvs/dws/proj + attention_biases, PatchMerging conv1/conv2/se/conv3,
# BN_Linear head (bn, l).

import itertools  # noqa: E402


class _C2BN(tnn.Sequential):
    def __init__(self, a, b, ks=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.add_module("c", tnn.Conv2d(a, b, ks, stride, pad,
                                        groups=groups, bias=False))
        self.add_module("bn", tnn.BatchNorm2d(b))


class _EvRes(tnn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, x):
        return x + self.m(x)


class _EvFFN(tnn.Module):
    def __init__(self, ed, h):
        super().__init__()
        self.pw1 = _C2BN(ed, h)
        self.act = tnn.ReLU()
        self.pw2 = _C2BN(h, ed)

    def forward(self, x):
        return self.pw2(self.act(self.pw1(x)))


class _EvSE(tnn.Module):
    """timm SEModule layout (fc1/fc2 1x1 convs with bias)."""

    def __init__(self, c, rd_ratio=0.25):
        super().__init__()
        rd = int(c * rd_ratio)
        self.fc1 = tnn.Conv2d(c, rd, 1)
        self.fc2 = tnn.Conv2d(rd, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class _EvCGA(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, resolution, kernels):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.scale = key_dim ** -0.5
        self.d = dim // num_heads
        self.qkvs = tnn.ModuleList(
            _C2BN(dim // num_heads, key_dim * 2 + self.d)
            for _ in range(num_heads)
        )
        self.dws = tnn.ModuleList(
            _C2BN(key_dim, key_dim, kernels[i], 1, kernels[i] // 2,
                  groups=key_dim)
            for i in range(num_heads)
        )
        self.proj = tnn.Sequential(tnn.ReLU(),
                                   _C2BN(self.d * num_heads, dim))
        points = list(itertools.product(range(resolution), range(resolution)))
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, len(offsets))
        )
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(points), len(points)),
        )

    def forward(self, x):
        B, C, H, W = x.shape
        ab = self.attention_biases[:, self.attention_bias_idxs]
        feats_in = x.chunk(self.num_heads, dim=1)
        feats_out = []
        feat = feats_in[0]
        for i, qkv in enumerate(self.qkvs):
            if i > 0:
                feat = feat + feats_in[i]
            feat = qkv(feat)
            q, k, v = feat.split([self.key_dim, self.key_dim, self.d], dim=1)
            q = self.dws[i](q)
            q, k, v = (t.flatten(2) for t in (q, k, v))
            attn = (q.transpose(-2, -1) @ k) * self.scale + ab[i]
            attn = attn.softmax(dim=-1)
            feat = (v @ attn.transpose(-2, -1)).view(B, self.d, H, W)
            feats_out.append(feat)
        return self.proj(torch.cat(feats_out, 1))


class _EvLWA(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, resolution, window, kernels):
        super().__init__()
        self.wr = min(window, resolution)
        self.attn = _EvCGA(dim, key_dim, num_heads, self.wr, kernels)

    def forward(self, x):
        B, C, H, W = x.shape
        wr = self.wr
        if H <= wr and W <= wr:
            return self.attn(x)
        x = x.permute(0, 2, 3, 1)
        pad_b, pad_r = (wr - H % wr) % wr, (wr - W % wr) % wr
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        pH, pW = H + pad_b, W + pad_r
        nH, nW = pH // wr, pW // wr
        x = (x.view(B, nH, wr, nW, wr, C).transpose(2, 3)
             .reshape(B * nH * nW, wr, wr, C).permute(0, 3, 1, 2))
        x = self.attn(x)
        x = (x.permute(0, 2, 3, 1).view(B, nH, nW, wr, wr, C)
             .transpose(2, 3).reshape(B, pH, pW, C))
        return x[:, :H, :W].permute(0, 3, 1, 2)


class _EvBlock(tnn.Module):
    def __init__(self, ed, key_dim, nh, resolution, window, kernels):
        super().__init__()
        self.dw0 = _EvRes(_C2BN(ed, ed, 3, 1, 1, groups=ed))
        self.ffn0 = _EvRes(_EvFFN(ed, ed * 2))
        self.mixer = _EvRes(
            _EvLWA(ed, key_dim, nh, resolution, window, kernels)
        )
        self.dw1 = _EvRes(_C2BN(ed, ed, 3, 1, 1, groups=ed))
        self.ffn1 = _EvRes(_EvFFN(ed, ed * 2))

    def forward(self, x):
        return self.ffn1(self.dw1(self.mixer(self.ffn0(self.dw0(x)))))


class _EvPatchMerging(tnn.Module):
    def __init__(self, dim, out):
        super().__init__()
        hid = dim * 4
        self.conv1 = _C2BN(dim, hid)
        self.act = tnn.ReLU()
        self.conv2 = _C2BN(hid, hid, 3, 2, 1, groups=hid)
        self.se = _EvSE(hid)
        self.conv3 = _C2BN(hid, out)

    def forward(self, x):
        return self.conv3(self.se(self.act(self.conv2(
            self.act(self.conv1(x))))))


class _MsraEfficientViT(tnn.Module):
    def __init__(self, img_size=224, embed_dims=(64, 128, 192),
                 depths=(1, 2, 3), num_heads=(4, 4, 4), window=7,
                 key_dim=16, kernels=(5, 5, 5, 5), num_classes=1000):
        super().__init__()
        d0 = embed_dims[0]
        self.patch_embed = tnn.Sequential(
            _C2BN(3, d0 // 8, 3, 2, 1), tnn.ReLU(),
            _C2BN(d0 // 8, d0 // 4, 3, 2, 1), tnn.ReLU(),
            _C2BN(d0 // 4, d0 // 2, 3, 2, 1), tnn.ReLU(),
            _C2BN(d0 // 2, d0, 3, 2, 1),
        )
        res = img_size // 16
        self.blocks1 = tnn.Sequential()
        self.blocks2 = tnn.Sequential()
        self.blocks3 = tnn.Sequential()
        stage_seqs = [self.blocks1, self.blocks2, self.blocks3]
        for i, (ed, dpth, nh) in enumerate(
            zip(embed_dims, depths, num_heads)
        ):
            for _ in range(dpth):
                stage_seqs[i].append(
                    _EvBlock(ed, key_dim, nh, res, window, kernels)
                )
            if i < 2:
                nxt = embed_dims[i + 1]
                stage_seqs[i + 1].append(tnn.Sequential(
                    _EvRes(_C2BN(ed, ed, 3, 1, 1, groups=ed)),
                    _EvRes(_EvFFN(ed, ed * 2)),
                ))
                stage_seqs[i + 1].append(_EvPatchMerging(ed, nxt))
                res = (res - 1) // 2 + 1
                stage_seqs[i + 1].append(tnn.Sequential(
                    _EvRes(_C2BN(nxt, nxt, 3, 1, 1, groups=nxt)),
                    _EvRes(_EvFFN(nxt, nxt * 2)),
                ))
        head = tnn.Sequential()
        head.add_module("bn", tnn.BatchNorm1d(embed_dims[-1]))
        head.add_module("l", tnn.Linear(embed_dims[-1], num_classes))
        self.head = head

    def forward(self, x):
        x = self.patch_embed(x)
        x = self.blocks3(self.blocks2(self.blocks1(x)))
        return self.head(x.flatten(2).mean(2))


def test_efficientvit_torch_parity():
    torch.manual_seed(6)
    net = _MsraEfficientViT(num_classes=5).eval()
    _randomize_bn(net)
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
        if isinstance(m, _EvCGA):
            with torch.no_grad():
                m.attention_biases.uniform_(-0.5, 0.5)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("efficientvit_m0", net.state_dict(), x.numpy(),
                       num_classes=5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pickled_torch_layout_in_model_container_is_converted(tmp_path):
    """A plain-pickled {'model': <torch-naming numpy state_dict>} must go
    through conversion, not be mistaken for a repo checkpoint (whose keys
    are '/'-joined and which carries format_version)."""
    import pickle

    from imageclassification_tpu.checkpoint.torch_convert import (
        load_pretrained_flat,
    )

    torch.manual_seed(7)
    net = _TorchResNet(_TorchBasic, [2, 2, 2, 2], num_classes=6, expansion=1)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    p = tmp_path / "wrapped.pth"
    with open(p, "wb") as f:
        pickle.dump({"model": sd}, f)
    ck = load_pretrained_flat(str(p), "resnet18")
    assert "conv_stem/kernel" in ck["model"]          # converted to flax keys
    assert "bn_stem/mean" in ck["batch_stats"]


# --------------------------------------------------------- ConvNeXt-V2 (GRN)


class _FBGRN(tnn.Module):
    """facebookresearch/ConvNeXt-V2 GRN (params stored [1,1,1,C], NHWC in)."""

    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.zeros(1, 1, 1, dim))
        self.beta = tnn.Parameter(torch.zeros(1, 1, 1, dim))

    def forward(self, x):
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class _FBV2Block(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, 4 * dim)
        self.act = tnn.GELU()
        self.grn = _FBGRN(4 * dim)
        self.pwconv2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        s = x
        x = self.dwconv(x).permute(0, 2, 3, 1)
        x = self.pwconv2(self.grn(self.act(self.pwconv1(self.norm(x)))))
        return s + x.permute(0, 3, 1, 2)


def test_convnextv2_torch_parity():
    torch.manual_seed(8)
    net = _FBConvNeXt((2, 2, 6, 2), (40, 80, 160, 320), num_classes=5,
                      block=_FBV2Block).eval()
    for m in net.modules():
        if isinstance(m, _FBGRN):  # exercise GRN beyond its zero init
            with torch.no_grad():
                m.gamma.uniform_(0.5, 1.5)
                m.beta.uniform_(-0.2, 0.2)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("convnextv2_atto", net.state_dict(), x.numpy(),
                       num_classes=5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# --------------------------------------------- torchvision MobileNetV3 -----
# mirrors torchvision/models/mobilenetv3.py module naming exactly:
# features.{i}.block.{j}.{0,1} Conv2dNormActivation, SE fc1/fc2 1x1 convs,
# classifier.{0,3} Linears


class _TVSqueezeExcitation(tnn.Module):
    def __init__(self, in_ch, squeeze):
        super().__init__()
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc1 = tnn.Conv2d(in_ch, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, in_ch, 1)

    def forward(self, x):
        s = torch.relu(self.fc1(self.avgpool(x)))
        return x * torch.nn.functional.hardsigmoid(self.fc2(s))


def _tv_cna(cin, cout, k, stride, groups=1, act="hs"):
    pad = (k - 1) // 2
    layers = [
        tnn.Conv2d(cin, cout, k, stride, pad, groups=groups, bias=False),
        tnn.BatchNorm2d(cout, eps=0.001),
    ]
    if act == "hs":
        layers.append(tnn.Hardswish())
    elif act == "re":
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class _TVInvertedResidual(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        act = "hs" if cfg.use_hs else "re"
        layers = []
        if cfg.expanded != cfg.in_ch:
            layers.append(_tv_cna(cfg.in_ch, cfg.expanded, 1, 1, act=act))
        layers.append(_tv_cna(cfg.expanded, cfg.expanded, cfg.kernel,
                              cfg.stride, groups=cfg.expanded, act=act))
        if cfg.use_se:
            from imageclassification_tpu.models.mobilenetv3 import (
                _make_divisible,
            )

            layers.append(
                _TVSqueezeExcitation(cfg.expanded,
                                     _make_divisible(cfg.expanded // 4))
            )
        layers.append(_tv_cna(cfg.expanded, cfg.out_ch, 1, 1, act="none"))
        self.block = tnn.Sequential(*layers)
        self.use_res = cfg.stride == 1 and cfg.in_ch == cfg.out_ch

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _TVMobileNetV3(tnn.Module):
    def __init__(self, cfgs, last_channel, num_classes):
        super().__init__()
        feats = [_tv_cna(3, 16, 3, 2, act="hs")]
        feats += [_TVInvertedResidual(c) for c in cfgs]
        last_conv = 6 * cfgs[-1].out_ch
        feats.append(_tv_cna(cfgs[-1].out_ch, last_conv, 1, 1, act="hs"))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(
            tnn.Linear(last_conv, last_channel),
            tnn.Hardswish(),
            tnn.Dropout(0.2),
            tnn.Linear(last_channel, num_classes),
        )

    def forward(self, x):
        x = self.features(x).mean(dim=(2, 3))
        return self.classifier(x)


@pytest.mark.parametrize("name", ["mobilenet_v3_small", "mobilenet_v3_large"])
def test_mobilenetv3_torch_parity(name):
    from imageclassification_tpu.models.mobilenetv3 import _LARGE, _SMALL

    cfgs, last_channel = (
        (_SMALL, 1024) if "small" in name else (_LARGE, 1280)
    )
    torch.manual_seed(11)
    net = _TVMobileNetV3(cfgs, last_channel, num_classes=6).eval()
    _randomize_bn(net)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits(name, net.state_dict(), x.numpy(), num_classes=6)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------------- timm EfficientNet -------
# mirrors timm/models/efficientnet.py module naming exactly: conv_stem/bn1,
# blocks.{s}.{j}.conv_pw/bn1 conv_dw/bn2 se.conv_reduce/conv_expand
# conv_pwl/bn3 (stage 0: conv_dw/bn1 se conv_pw/bn2), conv_head/bn2,
# classifier


class _TimmSE(tnn.Module):
    def __init__(self, mid, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(mid, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, mid, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = tnn.functional.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _TimmDSConv(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv_dw = tnn.Conv2d(cin, cin, k, stride, (k - 1) // 2,
                                  groups=cin, bias=False)
        self.bn1 = tnn.BatchNorm2d(cin)
        self.se = _TimmSE(cin, max(1, int(cin * 0.25)))
        self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.has_res = stride == 1 and cin == cout

    def forward(self, x):
        y = tnn.functional.silu(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(self.se(y)))
        return x + y if self.has_res else y


class _TimmIR(tnn.Module):
    def __init__(self, cin, cout, k, stride, expand):
        super().__init__()
        mid = cin * expand
        self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv_dw = tnn.Conv2d(mid, mid, k, stride, (k - 1) // 2,
                                  groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.se = _TimmSE(mid, max(1, int(cin * 0.25)))
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.has_res = stride == 1 and cin == cout

    def forward(self, x):
        y = tnn.functional.silu(self.bn1(self.conv_pw(x)))
        y = tnn.functional.silu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(self.se(y)))
        return x + y if self.has_res else y


class _TimmEfficientNet(tnn.Module):
    def __init__(self, name, num_classes):
        super().__init__()
        import math as _math

        from imageclassification_tpu.models.efficientnet import (
            _B0_STAGES,
            _VARIANTS,
            round_channels,
        )

        w, d = _VARIANTS[name]
        stem = round_channels(32 * w)
        self.conv_stem = tnn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(stem)
        cin = stem
        stages = []
        for k, s, e, c, r in _B0_STAGES:
            cout = round_channels(c * w)
            blocks = []
            for j in range(int(_math.ceil(r * d))):
                stride = s if j == 0 else 1
                if e == 1:
                    blocks.append(_TimmDSConv(cin, cout, k, stride))
                else:
                    blocks.append(_TimmIR(cin, cout, k, stride, e))
                cin = cout
            stages.append(tnn.Sequential(*blocks))
        self.blocks = tnn.Sequential(*stages)
        head = round_channels(1280 * w)
        self.conv_head = tnn.Conv2d(cin, head, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(head)
        self.classifier = tnn.Linear(head, num_classes)

    def forward(self, x):
        x = tnn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = tnn.functional.silu(self.bn2(self.conv_head(x)))
        return self.classifier(x.mean(dim=(2, 3)))


@pytest.mark.parametrize("name", ["efficientnet_b0", "efficientnet_b2"])
def test_efficientnet_torch_parity(name):
    torch.manual_seed(13)
    net = _TimmEfficientNet(name, num_classes=6).eval()
    _randomize_bn(net)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits(name, net.state_dict(), x.numpy(), num_classes=6)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------ timm Swin ----------
# mirrors timm/models/swin_transformer.py classic naming: patch_embed.proj/
# norm, layers.{s}.blocks.{b}.{norm1,attn.qkv,attn.proj,
# attn.relative_position_bias_table,norm2,mlp.fc1/fc2},
# layers.{s}.downsample.{norm,reduction}, norm, head


def _tswin_partition(x, w):
    B, H, W, C = x.shape
    return (
        x.view(B, H // w, w, W // w, w, C)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, w * w, C)
    )


def _tswin_reverse(x, w, H, W):
    B = x.shape[0] // (H // w * W // w)
    return (
        x.view(B, H // w, W // w, w, w, -1)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, -1)
    )


class _TSwinAttn(tnn.Module):
    def __init__(self, dim, heads, w):
        super().__init__()
        self.heads, self.w = heads, w
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * w - 1) ** 2, heads) * 0.02
        )
        from imageclassification_tpu.models.swin import (
            _relative_position_index,
        )

        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(_relative_position_index(w).copy()).long(),
        )

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h, hd = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(B_, h, N, N)
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(y)


class _TSwinMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TSwinBlock(tnn.Module):
    def __init__(self, dim, res, heads, w, shift):
        super().__init__()
        if res <= w:
            w, shift = res, 0
        self.res, self.w, self.shift = res, w, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TSwinAttn(dim, heads, w)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _TSwinMlp(dim, 4 * dim)
        if shift:
            from imageclassification_tpu.models.swin import _shift_attn_mask

            self.register_buffer(
                "attn_mask",
                torch.from_numpy(_shift_attn_mask(res, res, w, shift).copy()),
            )
        else:
            self.attn_mask = None

    def forward(self, x):  # x [B, H, W, C]
        B, H, W, C = x.shape
        y = self.norm1(x)
        if self.shift:
            y = torch.roll(y, (-self.shift, -self.shift), dims=(1, 2))
        y = _tswin_partition(y, self.w)
        y = self.attn(y, self.attn_mask)
        y = _tswin_reverse(y, self.w, H, W)
        if self.shift:
            y = torch.roll(y, (self.shift, self.shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))


class _TSwinDownsample(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):  # [B, H, W, C]
        y = torch.cat([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2],
        ], dim=-1)
        return self.reduction(self.norm(y))


class _TSwinStage(tnn.Module):
    def __init__(self, dim, res, depth, heads, w, last):
        super().__init__()
        self.blocks = tnn.ModuleList([
            _TSwinBlock(dim, res, heads, w, 0 if b % 2 == 0 else w // 2)
            for b in range(depth)
        ])
        self.downsample = None if last else _TSwinDownsample(dim)

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class _TSwinPatchEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, 4, 4)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):  # NCHW -> [B, H/4, W/4, C]
        return self.norm(self.proj(x).permute(0, 2, 3, 1))


class _TimmSwin(tnn.Module):
    def __init__(self, dim, depths, heads, img, num_classes, w=7):
        super().__init__()
        self.patch_embed = _TSwinPatchEmbed(dim)
        res = img // 4
        self.layers = tnn.ModuleList()
        for s, depth in enumerate(depths):
            self.layers.append(_TSwinStage(
                dim * 2 ** s, res, depth, heads[s], w,
                last=s == len(depths) - 1,
            ))
            if s != len(depths) - 1:
                res //= 2
        self.norm = tnn.LayerNorm(dim * 2 ** (len(depths) - 1))
        self.head = tnn.Linear(dim * 2 ** (len(depths) - 1), num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return self.head(self.norm(x).mean(dim=(1, 2)))


def test_swin_torch_parity():
    torch.manual_seed(17)
    net = _TimmSwin(96, (2, 2, 6, 2), (3, 6, 12, 24), img=224,
                    num_classes=4).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("swin_tiny_patch4_window7_224", net.state_dict(),
                       x.numpy(), num_classes=4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


# -------------------------------------------- torchvision DenseNet ---------
# mirrors torchvision/models/densenet.py naming: features.conv0/norm0,
# features.denseblock{i}.denselayer{j}.{norm1,conv1,norm2,conv2},
# features.transition{i}.{norm,conv}, features.norm5, classifier


class _TVDenseLayer(tnn.Module):
    def __init__(self, cin, growth):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(4 * growth)
        self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], dim=1)


class _TVDenseNet(tnn.Module):
    def __init__(self, cfg, growth, num_classes):
        super().__init__()
        feats = tnn.Module()
        feats.conv0 = tnn.Conv2d(3, 2 * growth, 7, 2, 3, bias=False)
        feats.norm0 = tnn.BatchNorm2d(2 * growth)
        c = 2 * growth
        for i, layers in enumerate(cfg):
            block = tnn.Module()
            for j in range(layers):
                setattr(block, f"denselayer{j + 1}", _TVDenseLayer(c, growth))
                c += growth
            setattr(feats, f"denseblock{i + 1}", block)
            if i != len(cfg) - 1:
                tr = tnn.Module()
                tr.norm = tnn.BatchNorm2d(c)
                tr.conv = tnn.Conv2d(c, c // 2, 1, bias=False)
                setattr(feats, f"transition{i + 1}", tr)
                c //= 2
        feats.norm5 = tnn.BatchNorm2d(c)
        self.features = feats
        self.classifier = tnn.Linear(c, num_classes)
        self.cfg = cfg

    def forward(self, x):
        f = self.features
        x = tnn.functional.max_pool2d(
            torch.relu(f.norm0(f.conv0(x))), 3, 2, 1
        )
        for i in range(len(self.cfg)):
            block = getattr(f, f"denseblock{i + 1}")
            for j in range(self.cfg[i]):
                x = getattr(block, f"denselayer{j + 1}")(x)
            if i != len(self.cfg) - 1:
                tr = getattr(f, f"transition{i + 1}")
                x = tnn.functional.avg_pool2d(
                    tr.conv(torch.relu(tr.norm(x))), 2, 2
                )
        x = torch.relu(f.norm5(x)).mean(dim=(2, 3))
        return self.classifier(x)


def test_densenet_torch_parity():
    torch.manual_seed(19)
    net = _TVDenseNet((6, 12, 24, 16), 32, num_classes=5).eval()
    _randomize_bn(net)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy()
    got = _flax_logits("densenet121", net.state_dict(), x.numpy(),
                       num_classes=5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
