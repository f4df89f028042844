"""Runnable segmentation stack (downstream/upernet + seg_engine + seg_train).

The reference's segmentation layer is config-only and defers execution to an
external mmseg checkout (semantic_segmentation/README.md:44-67); these tests
exercise the repo's runnable TPU equivalent end to end on the CPU mesh.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from imageclassification_tpu.downstream.seg_engine import (
    build_seg_eval_step, build_seg_train_step, confusion_update,
    create_seg_optimizer, miou_from_confusion, seg_loss)
from imageclassification_tpu.downstream.upernet import (
    UPerNet, _adaptive_avg_pool, build_upernet)
from imageclassification_tpu.optim.schedules import poly_scheduler


def test_adaptive_avg_pool_matches_torch_bins():
    # brute-force torch AdaptiveAvgPool2d bin edges on a non-divisible size
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 10, 3)).astype(np.float32)
    for s in (1, 2, 3, 6):
        got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), s))
        want = np.zeros((2, s, s, 3), np.float32)
        H, W = 7, 10
        for i in range(s):
            r0, r1 = (i * H) // s, -(-((i + 1) * H) // s)
            for j in range(s):
                c0, c1 = (j * W) // s, -(-((j + 1) * W) // s)
                want[:, i, j] = x[:, r0:r1, c0:c1].mean(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # divisible case goes down the reduce_window fast path
        xd = rng.normal(size=(1, 12, 12, 2)).astype(np.float32)
        gd = np.asarray(_adaptive_avg_pool(jnp.asarray(xd), s))
        wd = xd.reshape(1, s, 12 // s, s, 12 // s, 2).mean(axis=(2, 4))
        np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=1e-6)


def test_poly_scheduler_mmseg_semantics():
    vals = poly_scheduler(1e-4, 1000, power=1.0, min_value=0.0,
                          warmup_iters=100, warmup_ratio=1e-6)
    assert len(vals) == 1000
    # iter 0: lr = base * warmup_ratio (mmseg linear warmup start)
    np.testing.assert_allclose(vals[0], 1e-4 * 1e-6, rtol=1e-6)
    # at the end of warmup the poly value is recovered exactly
    np.testing.assert_allclose(vals[100], 1e-4 * (1 - 100 / 1000), rtol=1e-9)
    # pure poly decay after warmup, hitting min at the last step
    np.testing.assert_allclose(vals[999], 1e-4 * (1 - 999 / 1000), rtol=1e-9)
    assert np.all(np.diff(vals[100:]) < 0)
    # power != 1
    v2 = poly_scheduler(2.0, 10, power=0.5, min_value=0.1)
    np.testing.assert_allclose(v2[4], (2.0 - 0.1) * (1 - 0.4) ** 0.5 + 0.1)


def test_seg_loss_ignores_255_and_weights_aux():
    B, H, W, C = 2, 4, 4, 3
    rng = np.random.default_rng(1)
    main = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    aux = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    labels[0, :2] = 255  # ignored band
    l_full = seg_loss(main, aux, jnp.asarray(labels))

    # brute force: CE over valid pixels only
    def ce_np(logits):
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        tot, n = 0.0, 0
        for b in range(B):
            for i in range(H):
                for j in range(W):
                    if labels[b, i, j] != 255:
                        tot -= logp[b, i, j, labels[b, i, j]]
                        n += 1
        return tot / n

    want = ce_np(main) + 0.4 * ce_np(aux)
    np.testing.assert_allclose(float(l_full), want, rtol=1e-5)
    # no-aux path
    l_main = seg_loss(main, None, jnp.asarray(labels))
    np.testing.assert_allclose(float(l_main), ce_np(main), rtol=1e-5)


def test_confusion_miou_brute_force():
    C = 4
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(3, 5, 5, C)).astype(np.float32)
    labels = rng.integers(0, C, (3, 5, 5)).astype(np.int32)
    labels[0, 0] = 255
    conf = np.asarray(confusion_update(
        jnp.zeros((C, C), jnp.float32), jnp.asarray(logits),
        jnp.asarray(labels), C))
    preds = logits.argmax(-1)
    want = np.zeros((C, C))
    for t, p in zip(labels.reshape(-1), preds.reshape(-1)):
        if t != 255:
            want[t, p] += 1
    np.testing.assert_array_equal(conf, want)
    miou, iou, acc = miou_from_confusion(conf)
    ious = []
    for c in range(C):
        inter = want[c, c]
        union = want[c].sum() + want[:, c].sum() - inter
        if union > 0:
            ious.append(inter / union)
    np.testing.assert_allclose(miou, np.mean(ious), rtol=1e-9)
    np.testing.assert_allclose(acc, np.trace(want) / want.sum(), rtol=1e-9)


def test_upernet_reference_param_count_and_shapes():
    # reference README publishes ConvNeXt-T UPerNet at 60M params
    # (semantic_segmentation/README.md:18); exact module wiring per
    # configs/_base_/models/upernet_convnext.py:10-49
    model, cfg = build_upernet("upernet_convnext_tiny_512_160k", num_classes=4)
    v = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)), train=False))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert 59e6 < n < 61e6, n
    assert set(v["params"]) == {"backbone", "decode_head", "auxiliary_head"}
    assert cfg.crop_size == 512 and cfg.lr == 1e-4


def test_seg_stage_wise_decay_scales():
    """Exact reference constructor semantics (stage_wise,
    layer_decay_optimizer_constructor.py:45-54,100): N = num_layers + 2;
    stem/downsample -> id 0, stage i -> i+1, heads/out-norms -> N-1;
    scale = rate^(N - id - 1)."""
    from imageclassification_tpu.downstream.seg_engine import seg_decay_scales
    from imageclassification_tpu.models import create_model

    bb = create_model("convnext_atto", num_classes=0, features_only=True,
                      out_indices=(0, 1, 2, 3))
    m = UPerNet(backbone=bb, num_classes=3, channels=32)
    v = jax.eval_shape(lambda: m.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=False))
    scales = seg_decay_scales(v["params"], "stage_wise", 0.9, num_layers=12)
    n = 14
    get = lambda *ks: float(__import__("functools").reduce(
        lambda d, k: d[k], ks, scales))
    np.testing.assert_allclose(get("backbone", "stem_conv", "kernel"),
                               0.9 ** (n - 1))
    np.testing.assert_allclose(
        get("backbone", "downsample_conv1", "kernel"), 0.9 ** (n - 1))
    np.testing.assert_allclose(
        get("backbone", "stage0_block0", "Conv_0", "kernel"), 0.9 ** (n - 2))
    np.testing.assert_allclose(
        get("backbone", "stage3_block1", "Conv_0", "kernel"), 0.9 ** (n - 5))
    # heads and backbone out-norms at full LR
    np.testing.assert_allclose(get("decode_head", "conv_seg", "kernel"), 1.0)
    np.testing.assert_allclose(get("backbone", "norm2", "scale"), 1.0)

    # layer_wise delegates to the classification ConvNeXt map; heads stay 1.0
    lw = seg_decay_scales(v["params"], "layer_wise", 0.9)
    assert float(lw["decode_head"]["conv_seg"]["kernel"]) == 1.0
    assert float(lw["backbone"]["stem_conv"]["kernel"]) < \
        float(lw["backbone"]["stage3_block1"]["Conv_0"]["kernel"])


def test_confusion_ignores_out_of_range_labels():
    # labels >= num_classes (e.g. an id missed by auto-num_classes) must be
    # excluded like 255, not corrupt row 0 / crash
    C = 3
    logits = jnp.zeros((1, 2, 2, C))
    labels = jnp.asarray([[[0, 7], [255, 2]]], jnp.int32)
    conf = np.asarray(confusion_update(
        jnp.zeros((C, C), jnp.float32), logits, labels, C))
    assert conf.sum() == 2  # only labels 0 and 2 counted
    assert conf[0, 0] == 1 and conf[2, 0] == 1


def test_reference_config_values():
    """Field-for-field against the vendored ss configs: tiny paramwise
    num_layers 6 (upernet_convnext_tiny_...ss.py:40), xlarge lr 8e-5,
    stage_wise everywhere, 640-crop slide stride 426."""
    from imageclassification_tpu.downstream.configs import (
        SEGMENTATION_CONFIGS)

    t = SEGMENTATION_CONFIGS["upernet_convnext_tiny_512_160k"]
    assert t.layer_decay_num_layers == 6 and t.decay_type == "stage_wise"
    assert t.eval_stride == 341 and t.drop_path_rate == 0.4
    for name, c in SEGMENTATION_CONFIGS.items():
        assert c.decay_type == "stage_wise", name
        assert c.eval_stride == (426 if c.crop_size == 640 else 341), name
    x = SEGMENTATION_CONFIGS["upernet_convnext_xlarge_22k_640_160k"]
    assert x.lr == 8e-5 and x.drop_path_rate == 0.4


def test_train_batches_rank_sharding_partitions_world():
    """Multi-host contract: the per-rank slices of a (seed, it) batch
    partition the single-host batch — same samples, same per-position
    augmentation keys, no duplicates across ranks."""
    import tempfile

    from imageclassification_tpu.downstream.seg_data import (scan_pairs,
                                                             train_batches)

    with tempfile.TemporaryDirectory() as d:
        _make_seg_folder(d, n_train=6, n_val=2, size=40)
        pairs = scan_pairs(d, "training")
        _, x_full, y_full = next(train_batches(pairs, 32, 8, 1, seed=3))
        parts = [next(train_batches(pairs, 32, 8, 1, seed=3, rank=r, world=2))
                 for r in range(2)]
        x_cat = np.concatenate([p[1] for p in parts])
        y_cat = np.concatenate([p[2] for p in parts])
        np.testing.assert_array_equal(x_full, x_cat)
        np.testing.assert_array_equal(y_full, y_cat)


def test_photometric_distortion_valid_and_seeded():
    from imageclassification_tpu.downstream.seg_data import (
        photometric_distortion)

    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    a = photometric_distortion(img, np.random.default_rng(4))
    b = photometric_distortion(img, np.random.default_rng(4))
    np.testing.assert_array_equal(a, b)  # counter-keyed determinism
    assert a.dtype == np.uint8 and a.shape == img.shape
    # over many seeds, at least one distortion actually changes pixels and
    # all outputs stay in range
    changed = False
    for s in range(8):
        out = photometric_distortion(img, np.random.default_rng(s))
        changed |= (out != img).any()
    assert changed


def test_slide_window_origins_and_inference():
    from imageclassification_tpu.downstream.seg_engine import (
        slide_inference, slide_window_origins)

    # mmseg origin law: i*stride clamped flush to the edge
    assert slide_window_origins(512, 512, 341) == [0]
    assert slide_window_origins(1024, 512, 341) == [0, 341, 512]
    assert slide_window_origins(100, 64, 48) == [0, 36]
    assert slide_window_origins(32, 64, 48) == [0]

    # a linear "model" makes average-of-overlaps exactly computable
    rng = np.random.default_rng(5)
    C, crop, stride = 3, 8, 5
    w = rng.normal(size=(3, C)).astype(np.float32)

    def window_fn(batch_u8):
        return batch_u8.astype(np.float32) @ w

    img = rng.integers(0, 255, (13, 17, 3), dtype=np.uint8)
    got = slide_inference(window_fn, img, C, crop, stride)
    assert got.shape == (13, 17, C)
    # the model is pointwise-linear, so averaging overlapping windows must
    # reproduce the whole-image application exactly (zero-padding cancels:
    # padded rows are sliced off before the return)
    want = img.astype(np.float32) @ w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # crop-sized image: slide == single whole window
    img2 = rng.integers(0, 255, (crop, crop, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        slide_inference(window_fn, img2, C, crop, stride),
        img2.astype(np.float32) @ w, rtol=1e-5, atol=1e-4)


def test_upernet_no_aux():
    from imageclassification_tpu.models import create_model

    bb = create_model("convnext_atto", num_classes=0, features_only=True,
                      out_indices=(0, 1, 2, 3))
    m = UPerNet(backbone=bb, num_classes=3, channels=32, aux_head=False)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               jnp.zeros((1, 32, 32, 3)), train=False)
    main, aux = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert main.shape == (2, 32, 32, 3) and aux is None
    assert "auxiliary_head" not in v["params"]


def _make_seg_folder(root, n_train=12, n_val=4, size=48):
    """Trivially separable task: left half class 0 (reddish), right half
    class 1 (bluish); a 255-ignore stripe at the top of every mask."""
    rng = np.random.default_rng(3)
    for split, n in (("training", n_train), ("validation", n_val)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/annotations/{split}", exist_ok=True)
        for i in range(n):
            img = np.zeros((size, size, 3), np.uint8)
            img[:, : size // 2, 0] = 200
            img[:, size // 2:, 2] = 200
            img = np.clip(
                img.astype(int) + rng.integers(-30, 30, img.shape), 0, 255
            ).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            mask[:, size // 2:] = 1
            mask[:2] = 255
            Image.fromarray(img).save(f"{root}/images/{split}/s{i}.png")
            Image.fromarray(mask).save(f"{root}/annotations/{split}/s{i}.png")


def test_seg_data_pipeline(tmp_path):
    from imageclassification_tpu.downstream.seg_data import (
        num_classes_from_masks, scan_pairs, train_sample, val_sample)

    _make_seg_folder(tmp_path)
    pairs = scan_pairs(str(tmp_path), "training")
    assert len(pairs) == 12
    assert num_classes_from_masks(pairs) == 2
    rng = np.random.default_rng(0)
    x, y = train_sample(*pairs[0], 32, rng)
    assert x.shape == (32, 32, 3) and y.shape == (32, 32)
    assert x.dtype == np.uint8 and y.dtype == np.int32
    assert set(np.unique(y)) <= {0, 1, 255}
    xv, yv = val_sample(*pairs[0], 24)
    assert xv.shape == (24, 24, 3) and yv.shape == (24, 24)
    # mask resampling must be NEAREST: no interpolated ids appear
    assert set(np.unique(yv)) <= {0, 1, 255}


def test_seg_train_learns_separable_task():
    """Direct-module convergence: a small UPerNet reaches high mIoU on the
    color-separable task in a few dozen iters on the CPU mesh."""
    from imageclassification_tpu.engine.state import TrainState
    from imageclassification_tpu.models import create_model

    bb = create_model("convnext_atto", num_classes=0, features_only=True,
                      out_indices=(0, 1, 2, 3))
    model = UPerNet(backbone=bb, num_classes=2, channels=32)
    rng = np.random.default_rng(4)

    def batch(n=8, size=32):
        img = np.zeros((n, size, size, 3), np.uint8)
        img[:, :, : size // 2, 0] = 200
        img[:, :, size // 2:, 2] = 200
        img = np.clip(img.astype(int) + rng.integers(-30, 30, img.shape),
                      0, 255).astype(np.uint8)
        lab = np.zeros((n, size, size), np.int32)
        lab[:, :, size // 2:] = 1
        return jnp.asarray(img), jnp.asarray(lab)

    key = jax.random.key(0)
    variables = model.init({"params": key, "dropout": jax.random.fold_in(key, 1)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    tx = create_seg_optimizer(3e-3, 0.05)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    lr_values = poly_scheduler(3e-3, 60, warmup_iters=5)
    step = jax.jit(build_seg_train_step(model, tx, lr_values, 0.05),
                   donate_argnums=(0,))
    losses = []
    for i in range(40):
        xs, ys = batch()
        state, loss = step(state, xs, ys, jax.random.fold_in(key, 100 + i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::8]

    eval_step = jax.jit(build_seg_eval_step(model, 2))
    xs, ys = batch()
    conf = np.asarray(eval_step(state, xs, ys), np.float64)
    miou, _, acc = miou_from_confusion(conf)
    assert miou > 0.6, (miou, acc)


@pytest.mark.slow
def test_seg_cli_end_to_end(tmp_path):
    """seg_train.py plumbing: recipe resolution, auto num_classes, training,
    eval, checkpoint + log.txt artifacts (ConvNeXt-T recipe at toy size)."""
    import seg_train

    _make_seg_folder(tmp_path, n_train=8, n_val=4, size=40)
    out = tmp_path / "train_seg" / "output"
    args = seg_train.get_args_parser().parse_args([
        "--data_path", str(tmp_path),
        "--config", "upernet_convnext_tiny_512_160k",
        "--crop_size", "32", "--batch_size", "4", "--total_iters", "4",
        "--warmup_iters", "2", "--log_interval", "2",
        "--output_dir", str(out),
    ])
    row = seg_train.main(args)
    assert 0.0 <= row["miou"] <= 1.0 and 0.0 <= row["aacc"] <= 1.0
    assert (out / "checkpoint-iter4.pth").exists()
    assert (out / "checkpoint-best.pth").exists()
    lines = [json.loads(l) for l in open(tmp_path / "train_seg" / "log.txt")]
    assert lines[-1]["iter"] == 4 and "iou_0" in lines[-1]
    # the checkpoint is readable by the framework loader and tagged
    from imageclassification_tpu.checkpoint.io import load_checkpoint

    ck = load_checkpoint(str(out / "checkpoint-best.pth"))
    assert ck["model_spec"]["task"] == "segmentation"

    # auto-resume: extending total_iters picks up checkpoint-iter4 (optimizer
    # restored, step continues at 4) and trains only the remaining 2 iters
    args2 = seg_train.get_args_parser().parse_args([
        "--data_path", str(tmp_path),
        "--config", "upernet_convnext_tiny_512_160k",
        "--crop_size", "32", "--batch_size", "4", "--total_iters", "6",
        "--warmup_iters", "2", "--log_interval", "2",
        "--output_dir", str(out),
    ])
    row2 = seg_train.main(args2)
    assert (out / "checkpoint-iter6.pth").exists()
    ck6 = load_checkpoint(str(out / "checkpoint-iter6.pth"))
    assert int(ck6["step"]) == 6
    assert 0.0 <= row2["miou"] <= 1.0

    # slide eval (mmseg ss test_cfg): resumes at 6/6 (no training) and
    # evaluates full-resolution 40x40 images with 32x32 windows
    args3 = seg_train.get_args_parser().parse_args([
        "--data_path", str(tmp_path),
        "--config", "upernet_convnext_tiny_512_160k",
        "--crop_size", "32", "--batch_size", "4", "--total_iters", "6",
        "--warmup_iters", "2", "--eval_mode", "slide",
        "--output_dir", str(out),
    ])
    row3 = seg_train.main(args3)
    assert 0.0 <= row3["miou"] <= 1.0 and 0.0 <= row3["aacc"] <= 1.0

    # ms eval (6 scales x hflip, softmax-averaged — the *_ms protocol):
    # resumes at 6/6 again, evaluates only
    args4 = seg_train.get_args_parser().parse_args([
        "--data_path", str(tmp_path),
        "--config", "upernet_convnext_tiny_512_160k",
        "--crop_size", "32", "--batch_size", "4", "--total_iters", "6",
        "--warmup_iters", "2", "--eval_mode", "ms",
        "--output_dir", str(out),
    ])
    row4 = seg_train.main(args4)
    assert 0.0 <= row4["miou"] <= 1.0 and 0.0 <= row4["aacc"] <= 1.0


def test_swin_pyramid_backbone_and_upernet():
    """Beyond reference: Swin exposes the same features_only pyramid as
    ConvNeXt (per-stage out-norms, strides 4-32), so it slots under the
    downstream adapters and UPerNet directly."""
    from imageclassification_tpu.downstream.backbone import ConvNeXtBackbone
    from imageclassification_tpu.models import create_model

    bb = ConvNeXtBackbone(variant="swin_tiny", half_precision=False)
    assert bb.feature_channels == [96, 192, 384, 768]
    assert bb.feature_strides == [4, 8, 16, 32]

    sw = create_model("swin_tiny", num_classes=0, features_only=True,
                      out_indices=(0, 1, 2, 3))
    v = jax.eval_shape(lambda: sw.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 224, 224, 3)), train=False))
    feats = jax.eval_shape(
        lambda: sw.apply(
            {"params": jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                    v["params"])},
            jnp.zeros((2, 224, 224, 3)), train=False))
    assert [f.shape for f in feats] == [
        (2, 56, 56, 96), (2, 28, 28, 192), (2, 14, 14, 384),
        (2, 7, 7, 768)]
    # UPerNet accepts the swin pyramid (aux head reads feats[2])
    m = UPerNet(backbone=sw, num_classes=5, channels=64)
    out = jax.eval_shape(lambda: m.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 224, 224, 3)), train=False))
    assert "decode_head" in out["params"] and "backbone" in out["params"]


def test_fpn_neck_shapes_and_extra_level():
    """mmdet FPN parity (the reference detection neck dict,
    mask_rcnn_convnext_fpn.py:22-26): 256ch at every level, strides
    4/8/16/32 preserved, P6 = kernel-1 stride-2 max-pool (pure subsample)
    of P5."""
    from imageclassification_tpu.downstream.fpn import FPN

    rng = np.random.default_rng(6)
    feats = [jnp.asarray(rng.normal(size=(2, 32 // s, 32 // s, c)),
                         jnp.float32)
             for s, c in [(1, 40), (2, 80), (4, 160), (8, 320)]]
    fpn = FPN(out_channels=64, num_outs=5)
    v = fpn.init(jax.random.key(0), feats)
    outs = fpn.apply(v, feats)
    assert len(outs) == 5
    assert [o.shape for o in outs] == [
        (2, 32, 32, 64), (2, 16, 16, 64), (2, 8, 8, 64), (2, 4, 4, 64),
        (2, 2, 2, 64)]
    # P6 is exactly P5 subsampled at even positions (kernel-1 pool)
    np.testing.assert_array_equal(np.asarray(outs[4]),
                                  np.asarray(outs[3])[:, ::2, ::2])


def test_detection_backbone_neck_runs():
    from imageclassification_tpu.downstream.fpn import (
        build_detection_backbone)

    bb, fpn, cfg = build_detection_backbone("mask_rcnn_convnext_tiny_3x")
    assert cfg.detector == "mask_rcnn" and cfg.layer_decay_rate == 0.7
    variables = bb.init(jax.random.key(0), (1, 64, 64, 3))
    feats = bb.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    fv = fpn.init(jax.random.key(1), feats)
    outs = fpn.apply(fv, feats)
    assert len(outs) == 5 and all(o.shape[-1] == 256 for o in outs)
    assert outs[0].shape[1] == 16  # stride 4 on a 64px input


def test_backbone_transfer_from_classifier(tmp_path):
    """transfer_backbone seeds UPerNet's encoder from a classification
    checkpoint (reference init_cfg path, backbone/convnext.py:110-138)."""
    from types import SimpleNamespace

    from imageclassification_tpu.checkpoint.io import save_model
    from imageclassification_tpu.downstream.seg_engine import transfer_backbone
    from imageclassification_tpu.engine.state import TrainState
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer

    cls_model = create_model("convnext_atto", num_classes=5)
    key = jax.random.key(7)
    cls_vars = cls_model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        jnp.zeros((1, 32, 32, 3)), train=False)
    tx = create_optimizer("adamw", 1e-3, 0.05)
    cls_state = TrainState(step=jnp.zeros([], jnp.int32),
                           params=cls_vars["params"], batch_stats={},
                           opt_state=tx.init(cls_vars["params"]))
    args = SimpleNamespace(output_dir=str(tmp_path), model_ema=False,
                           save_ckpt_num=1, save_ckpt_freq=1)
    save_model(args, (1, 32, 32, 3), "best", cls_state, 5, {"model": "x"})
    from imageclassification_tpu.checkpoint.io import wait_for_pending_saves
    wait_for_pending_saves()

    bb = create_model("convnext_atto", num_classes=0, features_only=True,
                      out_indices=(0, 1, 2, 3))
    seg = UPerNet(backbone=bb, num_classes=3, channels=32)
    seg_vars = seg.init({"params": key, "dropout": jax.random.fold_in(key, 1)},
                        jnp.zeros((1, 32, 32, 3)), train=False)
    merged = transfer_backbone(seg, seg_vars,
                               str(tmp_path / "checkpoint-best.pth"))
    # a stem kernel transfers verbatim; decode head untouched
    src = np.asarray(cls_state.params["stem_conv"]["kernel"])
    got = np.asarray(merged["params"]["backbone"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(src, got)
    np.testing.assert_array_equal(
        np.asarray(seg_vars["params"]["decode_head"]["fuse"]["conv"]["kernel"]),
        np.asarray(merged["params"]["decode_head"]["fuse"]["conv"]["kernel"]))
