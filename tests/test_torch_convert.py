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
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
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


@pytest.mark.parametrize("name,block,stages,exp", [
    ("resnet18", _TorchBasic, [2, 2, 2, 2], 1),
    ("resnet50", _TorchBottleneck, [3, 4, 6, 3], 4),
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

    def __init__(self, depths, dims, num_classes):
        super().__init__()
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
            tnn.Sequential(*[_FBBlock(dims[i]) for _ in range(depths[i])])
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
    with pytest.raises(ValueError, match="efficientvit"):
        convert_state_dict({}, "efficientvit_m0")
