"""Model zoo tests: init + forward shapes, train/eval modes, param counts sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageclassification_tpu.models import create_model, list_models, model_kwargs_for
from imageclassification_tpu.config import TrainConfig


def _init_and_forward(model, x, train=False):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    if train:
        out, mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"] if "batch_stats" in variables else [],
        )
        return out, variables
    out = model.apply(variables, x, train=False)
    return out, variables


@pytest.mark.parametrize(
    "name,size",
    [
        ("resnet18", 64),
        ("convnext_atto", 64),
        ("vit_tiny_patch16", 32),
        ("efficientvit_m0", 64),
        ("mobilenet_v3_small", 64),
        ("efficientnet_b0", 64),
        ("densenet121", 64),
    ],
)
def test_forward_shapes(name, size):
    model = create_model(name, num_classes=5, img_size=size) if name.startswith(
        "efficientvit"
    ) else create_model(name, num_classes=5)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    out, _ = _init_and_forward(model, x)
    assert out.shape == (2, 5)
    assert out.dtype == jnp.float32


def test_train_mode_runs_with_batchstats():
    model = create_model("resnet18", num_classes=3)
    x = jnp.ones((2, 32, 32, 3))
    out, variables = _init_and_forward(model, x, train=True)
    assert "batch_stats" in variables


def _param_count(model, shape):
    v = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros(shape), train=False)
    )
    return sum(p.size for p in jax.tree.leaves(v["params"]))


def test_param_count_resnet50():
    model = create_model("resnet50", num_classes=1000)
    n = _param_count(model, (1, 64, 64, 3))
    # torchvision resnet50 has 25.557M params
    assert abs(n - 25_557_032) / 25_557_032 < 0.01


def test_param_count_convnext_tiny():
    model = create_model("convnext_tiny", num_classes=1000)
    n = _param_count(model, (1, 32, 32, 3))
    # ConvNeXt-T is 28.6M params
    assert abs(n - 28_589_128) / 28_589_128 < 0.02


def test_efficientvit_m0_param_count():
    model = create_model("efficientvit_m0", num_classes=1000)
    n = _param_count(model, (1, 224, 224, 3))
    # MSRA EfficientViT-M0 is ~2.3M params
    assert 1.8e6 < n < 3.2e6, f"param count {n}"


def test_param_count_mobilenetv3():
    # torchvision: mobilenet_v3_large 5.483M, mobilenet_v3_small 2.543M
    n = _param_count(create_model("mobilenet_v3_large", num_classes=1000),
                     (1, 64, 64, 3))
    assert abs(n - 5_483_032) / 5_483_032 < 0.01, n
    n = _param_count(create_model("mobilenet_v3_small", num_classes=1000),
                     (1, 64, 64, 3))
    assert abs(n - 2_542_856) / 2_542_856 < 0.01, n


def test_param_count_efficientnet():
    # timm: b0 5,288,548 / b3 12,233,232 exactly (compound scaling check)
    n = _param_count(create_model("efficientnet_b0", num_classes=1000),
                     (1, 64, 64, 3))
    assert n == 5_288_548, n
    n = _param_count(create_model("efficientnet_b3", num_classes=1000),
                     (1, 64, 64, 3))
    assert n == 12_233_232, n


def test_swin_relative_position_index_brute_force():
    """Independent double-loop derivation of the relative-position index
    (Swin paper eq. 4 layout) — breaks the circularity where the torch-side
    parity model in test_torch_convert imports the repo's own table."""
    from imageclassification_tpu.models.swin import _relative_position_index

    for w in (2, 3, 7):
        n = w * w
        want = np.zeros((n, n), np.int64)
        for i in range(n):
            for j in range(n):
                ri, ci = divmod(i, w)
                rj, cj = divmod(j, w)
                want[i, j] = (ri - rj + w - 1) * (2 * w - 1) + (ci - cj + w - 1)
        np.testing.assert_array_equal(_relative_position_index(w), want)


def test_swin_shift_mask_brute_force():
    """Independent derivation of the shifted-window attention mask: after
    rolling by -shift, two positions in a window may attend iff their
    ORIGINAL coordinates have the same wrap-around status in both axes
    (equivalent to the canonical 3x3-slice region construction, derived
    without it). Window order is row-major over the window grid."""
    from imageclassification_tpu.models.swin import _shift_attn_mask

    for H, W, w, shift in [(14, 14, 7, 3), (28, 28, 7, 3), (8, 12, 4, 2)]:
        got = np.asarray(_shift_attn_mask(H, W, w, shift))
        wins = []
        for bi in range(H // w):
            for bj in range(W // w):
                rr, cc = np.meshgrid(np.arange(bi * w, bi * w + w),
                                     np.arange(bj * w, bj * w + w),
                                     indexing="ij")
                grp = ((rr + shift) >= H).astype(int) * 2 \
                    + ((cc + shift) >= W).astype(int)
                f = grp.reshape(-1)
                wins.append(np.where(f[:, None] == f[None, :], 0.0, -100.0))
        np.testing.assert_array_equal(got, np.stack(wins).astype(got.dtype))


def test_param_count_swin():
    # timm exact counts: tiny 28,288,354 / small 49,606,258 / base 87,768,224
    for name, want in [("swin_tiny", 28_288_354), ("swin_small", 49_606_258),
                       ("swin_base", 87_768_224)]:
        n = _param_count(create_model(name, num_classes=1000),
                         (1, 224, 224, 3))
        assert n == want, (name, n, want)


def test_swin_bad_input_size_raises():
    from imageclassification_tpu.models.swin import check_input_size

    model = create_model("swin_tiny", num_classes=3)
    # every unsupported size dies up front with the exact constraint —
    # including 112, which the old window-only guard recommended and which
    # then crashed opaquely inside PatchMerging (7x7 map, odd merge)
    for bad in (96, 112, 64, 336):
        with pytest.raises(ValueError, match="unsupported by Swin"):
            jax.eval_shape(lambda b=bad: model.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                jnp.zeros((1, b, b, 3)), train=False,
            ))
    # supported sizes pass the validator AND trace through all stages
    for good in (224, 448):
        check_input_size(good, 7)
        jax.eval_shape(lambda g=good: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, g, g, 3)), train=False,
        ))


def test_swin_merged_layout_equals_legacy():
    """The TPU merged window-attention layout (one fused partition+head
    transpose each way, 2 windows per attention group — the SwinBlock
    default, benchmarks/swin_layout_bench.json) computes the same function
    as the per-window timm dataflow, on the same parameter tree. Covers
    every case the layout branches on: shifted and unshifted blocks, G=2
    and G=1 window grids, and (via the full model below) the one-window
    clamp path."""
    from imageclassification_tpu.models.swin import SwinBlock

    rng = np.random.default_rng(7)
    # (H, C, heads, shift): 28² C=96 exercises G=2; 21² (3-window grid,
    # odd) exercises the merged path's G=1 fallback
    for H, C, heads, shift in [(28, 96, 3, 0), (28, 96, 3, 3),
                               (21, 64, 2, 3)]:
        x = jnp.asarray(rng.normal(size=(2, H, H, C)) * 0.1, jnp.float32)
        blocks = {
            layout: SwinBlock(dim=C, num_heads=heads, window=7, shift=shift,
                              attn_layout=layout)
            for layout in ("merged", "legacy")
        }
        params = blocks["merged"].init({"params": jax.random.key(0)}, x)
        outs = {layout: np.asarray(blk.apply(params, x))
                for layout, blk in blocks.items()}
        np.testing.assert_allclose(outs["merged"], outs["legacy"],
                                   rtol=1e-5, atol=1e-5)

    # full swin_tiny forward (all four stages incl. the clamped stage 3)
    m_merged = create_model("swin_tiny", num_classes=5)
    m_legacy = create_model("swin_tiny", num_classes=5, attn_layout="legacy")
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    variables = m_merged.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    a = np.asarray(m_merged.apply(variables, x, train=False))
    b = np.asarray(m_legacy.apply(variables, x, train=False))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_param_count_densenet():
    # torchvision exact counts
    for name, want in [("densenet121", 7_978_856),
                       ("densenet201", 20_013_928)]:
        n = _param_count(create_model(name, num_classes=1000),
                         (1, 64, 64, 3))
        assert n == want, (name, n, want)


def test_kwarg_routing():
    cfg = TrainConfig(model="efficientvit_m0", drop_path=0.1)
    kw = model_kwargs_for(cfg, 7)
    assert kw["drop_rate"] == 0.1 and "drop_path_rate" not in kw
    cfg = TrainConfig(model="convnext_tiny", drop_path=0.2)
    kw = model_kwargs_for(cfg, 7)
    assert kw["drop_path_rate"] == 0.2 and "drop_rate" not in kw
    # --flash_attn routes only to the vit family (Pallas TPU kernel; wins
    # at 384²+ per benchmarks/attention_bench_n577.json, opt-in)
    cfg = TrainConfig(model="vit_base_patch16", flash_attn=True)
    assert model_kwargs_for(cfg, 7)["flash_attn"] is True
    cfg = TrainConfig(model="vit_base_patch16")
    assert "flash_attn" not in model_kwargs_for(cfg, 7)
    cfg = TrainConfig(model="resnet50", flash_attn=True)
    assert "flash_attn" not in model_kwargs_for(cfg, 7)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        create_model("resnet9000")


def test_convnext_features_only():
    model = create_model("convnext_atto", num_classes=0, features_only=True)
    x = jnp.zeros((1, 64, 64, 3))
    feats = jax.eval_shape(
        lambda: model.init_with_output(jax.random.key(0), x, train=False)
    )[0]
    assert len(feats) == 4
    assert feats[0].shape == (1, 16, 16, 40)
    assert feats[3].shape == (1, 2, 2, 320)


def test_registry_has_reference_families():
    models = list_models()
    assert "efficientvit_m0" in models  # reference default (train.py:41)
    assert "convnext_tiny" in models and "resnet50" in models
    assert "vit_base_patch16" in models


def test_stem_space_to_depth_exact():
    """The space-to-depth stem reformulation is bit-level equivalent to the
    direct 7x7/s2 convolution (models/resnet.py StemConv)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.models.resnet import _space_to_depth_stem

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 36, 44, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 8)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = _space_to_depth_stem(x, k, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_odd_input_falls_back():
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.models import create_model

    model = create_model("resnet18", num_classes=3)
    x = jnp.zeros((1, 31, 31, 3))  # odd size: direct-conv fallback
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 3)


def test_resnext_and_wide_param_counts():
    # torchvision reference: resnext50_32x4d 25.0M, wide_resnet50_2 68.9M
    n = _param_count(create_model("resnext50_32x4d", num_classes=1000),
                     (1, 64, 64, 3))
    assert 24.5e6 < n < 25.6e6, n
    n = _param_count(create_model("wide_resnet50_2", num_classes=1000),
                     (1, 64, 64, 3))
    assert 68.0e6 < n < 69.8e6, n


def test_vit_headmajor_attention_equivalence():
    """attn_impl='bhnd' (HeadMajorAttention) must be parameter-tree identical
    and numerically equal to the flax MHA path — it is the measured layout
    experiment (benchmarks/attn_layout_bench.json) kept behind a flag."""
    import numpy as np

    from imageclassification_tpu.models.vit import ViT

    kw = dict(patch_size=16, dim=192, depth=2, num_heads=3, num_classes=5)
    m1 = ViT(attn_impl="flax", **kw)
    m2 = ViT(attn_impl="bhnd", **kw)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v1 = m1.init(rngs, x, train=False)
    v2 = m2.init(rngs, x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    y1 = m1.apply(v1, x, train=False)
    y2 = m2.apply(v1, x, train=False)  # SAME params through both paths
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
