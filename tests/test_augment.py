"""Golden tests: device image ops vs PIL reference outputs on fixed seeds
(SURVEY §4 point 1: 'augmentation kernels vs PIL reference outputs')."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from imageclassification_tpu.ops import image as I
from imageclassification_tpu.data.mixup import (
    MixupConfig,
    mixup_cutmix,
    one_hot_smooth,
)
from imageclassification_tpu.data.randaugment import parse_policy, rand_augment_batch
from imageclassification_tpu.data.augment import (
    AugmentPipeline,
    eval_preprocess,
    normalize,
    random_erasing,
    random_flips,
)
from imageclassification_tpu.config import TrainConfig


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(32, 24, 3)).astype(np.uint8)


def _pil(arr):
    return Image.fromarray(arr)


def _close(jax_out, pil_img, atol=1.5, frac=0.995):
    ref = np.asarray(pil_img, dtype=np.float32)
    got = np.asarray(jax_out)
    ok = np.abs(got - ref) <= atol
    assert ok.mean() >= frac, f"only {ok.mean():.3f} of pixels within {atol}"


def test_invert(img):
    _close(I.invert(jnp.asarray(img, jnp.float32)), ImageOps.invert(_pil(img)))


@pytest.mark.parametrize("bits", [1, 3, 4, 6])
def test_posterize(img, bits):
    out = I.posterize(jnp.asarray(img, jnp.float32), jnp.asarray(bits))
    _close(out, ImageOps.posterize(_pil(img), bits), atol=0.5)


@pytest.mark.parametrize("thresh", [26, 128, 230])
def test_solarize(img, thresh):
    out = I.solarize(jnp.asarray(img, jnp.float32), float(thresh))
    _close(out, ImageOps.solarize(_pil(img), thresh), atol=0.5)


def test_autocontrast(img):
    out = I.autocontrast(jnp.asarray(img, jnp.float32))
    _close(out, ImageOps.autocontrast(_pil(img)), atol=1.5)


def test_equalize(img):
    out = I.equalize(jnp.asarray(img, jnp.float32))
    _close(out, ImageOps.equalize(_pil(img)), atol=1.5)


@pytest.mark.parametrize("factor", [0.1, 0.7, 1.4])
def test_brightness(img, factor):
    out = I.adjust_brightness(jnp.asarray(img, jnp.float32), factor)
    _close(out, ImageEnhance.Brightness(_pil(img)).enhance(factor))


@pytest.mark.parametrize("factor", [0.3, 1.0, 1.8])
def test_contrast(img, factor):
    out = I.adjust_contrast(jnp.asarray(img, jnp.float32), factor)
    _close(out, ImageEnhance.Contrast(_pil(img)).enhance(factor))


@pytest.mark.parametrize("factor", [0.2, 1.5])
def test_saturation(img, factor):
    out = I.adjust_saturation(jnp.asarray(img, jnp.float32), factor)
    _close(out, ImageEnhance.Color(_pil(img)).enhance(factor), atol=2.0)


@pytest.mark.parametrize("factor", [0.3, 1.7])
def test_sharpness(img, factor):
    out = I.adjust_sharpness(jnp.asarray(img, jnp.float32), factor)
    _close(out, ImageEnhance.Sharpness(_pil(img)).enhance(factor), atol=2.0, frac=0.97)


def test_shear_x_matches_pil(img):
    v = 0.2
    out = I.shear_x(jnp.asarray(img, jnp.float32), v, jnp.array([128.0] * 3))
    ref = _pil(img).transform(
        _pil(img).size, Image.AFFINE, (1, v, 0, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128, 128, 128),
    )
    _close(out, ref, atol=2.0, frac=0.93)


def test_translate_matches_pil(img):
    out = I.translate_x(jnp.asarray(img, jnp.float32), 5.0, jnp.array([128.0] * 3))
    ref = _pil(img).transform(
        _pil(img).size, Image.AFFINE, (1, 0, 5, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128, 128, 128),
    )
    _close(out, ref, atol=1.0, frac=0.99)


def test_rotate_preserves_center_mass(img):
    # rotating by 360 == identity (up to interpolation at edges)
    x = jnp.asarray(img, jnp.float32)
    out = I.rotate(x, 360.0, jnp.array([128.0] * 3))
    assert float(jnp.abs(out - x).mean()) < 1.0


# ---------------------------------------------------------------- pipeline --


def test_randaugment_batch_runs_and_differs():
    cfg = parse_policy("rand-m9-mstd0.5-inc1")
    assert cfg.magnitude == 9 and cfg.mstd == 0.5 and cfg.increasing
    rng = jax.random.key(0)
    x = jnp.broadcast_to(
        jnp.asarray(np.random.default_rng(0).integers(0, 255, (16, 16, 3)),
                    jnp.float32), (4, 16, 16, 3))
    out = rand_augment_batch(x, rng, cfg)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    # per-sample keys → samples get different treatments
    diffs = [float(jnp.abs(out[i] - out[j]).max()) for i in range(3) for j in range(i + 1, 4)]
    assert max(diffs) > 0


def test_flips_deterministic_given_key():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    a = random_flips(x, jax.random.key(3))
    b = random_flips(x, jax.random.key(3))
    assert bool(jnp.all(a == b))


def test_normalize_values():
    x = jnp.full((1, 2, 2, 3), 0.5)
    out = normalize(x)
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_random_erasing_fraction():
    rng = jax.random.key(0)
    x = jnp.zeros((64, 32, 32, 3))
    out = random_erasing(x, rng, prob=1.0, mode="pixel", count=1)
    changed = (jnp.abs(out) > 0).any(axis=-1).mean(axis=(1, 2))
    # every sample should have an erased rectangle between ~2% and ~34%
    assert float(changed.min()) > 0.0
    assert float(changed.max()) <= 0.34 + 0.05
    out0 = random_erasing(x, rng, prob=0.0)
    assert float(jnp.abs(out0).max()) == 0.0


def test_mixup_batch_mode_targets_sum_to_one():
    cfg = MixupConfig(mixup_alpha=0.8, num_classes=5, label_smoothing=0.1)
    x = jnp.ones((8, 8, 8, 3))
    y = jnp.arange(8) % 5
    mixed, targets = mixup_cutmix(x, y, jax.random.key(0), cfg)
    assert mixed.shape == x.shape and targets.shape == (8, 5)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)


def test_cutmix_box_replaces_pixels():
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, num_classes=2,
                      label_smoothing=0.0, prob=1.0)
    x = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
    y = jnp.array([0, 1])
    mixed, targets = mixup_cutmix(x, y, jax.random.key(1), cfg)
    frac_ones = float((mixed[0] > 0.5).mean())
    # lam correction: target weight matches realized pixel fraction
    np.testing.assert_allclose(float(targets[0, 1]), frac_ones, atol=1e-5)


def test_one_hot_smooth():
    t = one_hot_smooth(jnp.array([1]), 4, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(t[0]),
                               [0.025, 0.925, 0.025, 0.025], rtol=1e-6)


def test_mixup_elem_and_pair_modes():
    for mode in ("elem", "pair"):
        cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=3,
                          mode=mode, label_smoothing=0.0)
        x = jnp.ones((6, 8, 8, 3))
        y = jnp.arange(6) % 3
        mixed, targets = mixup_cutmix(x, y, jax.random.key(2), cfg)
        assert mixed.shape == x.shape
        np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)


def test_mixup_pair_mode_shares_lam_per_pair():
    # timm _mix_pair: (i, B-1-i) share ONE lam / bbox. With distinct labels
    # and no smoothing, targets[i, y[i]] recovers lam_i — pairs must match.
    B, C = 8, 8
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=C,
                      mode="pair", label_smoothing=0.0, prob=1.0)
    x = jnp.ones((B, 16, 16, 3))
    y = jnp.arange(B)
    _, targets = mixup_cutmix(x, y, jax.random.key(5), cfg)
    lam = np.asarray(targets)[np.arange(B), np.arange(B)]
    np.testing.assert_allclose(lam, lam[::-1], atol=1e-6)
    # and the mix is symmetric: weight of partner's label = 1 - lam
    partner = np.asarray(targets)[np.arange(B), np.arange(B)[::-1]]
    np.testing.assert_allclose(partner, 1.0 - lam, atol=1e-6)


def test_full_pipeline_shapes_and_dtype():
    cfg = TrainConfig(aa="rand-m9-mstd0.5-inc1", reprob=0.25)
    pipe = AugmentPipeline(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)), jnp.uint8)
    out = jax.jit(pipe)(x, jax.random.key(0))
    assert out.shape == (4, 32, 32, 3) and out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())
    ev = eval_preprocess(x)
    assert ev.shape == out.shape


def test_abel_augment_policy():
    from imageclassification_tpu.data.abel import (
        AbelAugmentConfig,
        abel_augment_batch,
        anti_solarize,
        set_dark_pixels_to_zero,
    )

    img = jnp.asarray(np.random.default_rng(1).integers(0, 255, (16, 16, 3)),
                      jnp.float32)
    # dark-to-zero: pixels below threshold become 0
    out = set_dark_pixels_to_zero(img, 50.0)
    assert float(out[img < 50].max(initial=0.0)) == 0.0
    assert bool(jnp.all(out[img >= 50] == img[img >= 50]))
    # anti-solarize inverts pixels <= threshold
    out = anti_solarize(img, 100.0)
    assert bool(jnp.all(out[img > 100] == img[img > 100]))
    assert bool(jnp.all(out[img <= 100] == 255.0 - img[img <= 100]))

    batch = jnp.broadcast_to(img, (4, 16, 16, 3))
    out = abel_augment_batch(batch, jax.random.key(0), AbelAugmentConfig(2))
    assert out.shape == batch.shape and bool(jnp.isfinite(out).all())


def test_auto_augment_policies():
    from imageclassification_tpu.data.randaugment import (
        AutoAugmentConfig,
        auto_augment_batch,
    )

    x = jnp.asarray(np.random.default_rng(2).integers(0, 255, (4, 16, 16, 3)),
                    jnp.float32)
    for policy in ("original", "v0"):
        cfg = AutoAugmentConfig(policy)
        assert cfg.op_idx.shape == (25, 2)
        out = auto_augment_batch(x, jax.random.key(1), cfg)
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_pipeline_abel_and_auto_policies():
    for aa in ("abel-n2", "original", "v0"):
        cfg = TrainConfig(aa=aa, reprob=0.0)
        pipe = AugmentPipeline(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (2, 24, 24, 3)), jnp.uint8)
        out = jax.jit(pipe)(x, jax.random.key(0))
        assert out.shape == (2, 24, 24, 3)
        assert bool(jnp.isfinite(out).all())


def test_lighting_pca():
    from imageclassification_tpu.data.abel import lighting

    img = jnp.full((8, 8, 3), 100.0)
    out = lighting(img, jax.random.key(3), alphastd=0.1)
    assert out.shape == img.shape
    # noise is per-channel constant
    assert float(jnp.std(out[..., 0])) < 1e-5
    assert float(jnp.abs(out - img).max()) > 0


def test_randaugment_application_rate():
    """Each layer applies its op with prob≈0.5 (timm default): measure the
    fraction of images changed by a 1-layer identity-detectable policy."""
    from imageclassification_tpu.data.randaugment import RandAugmentConfig, rand_augment_batch

    # invert-only op set makes application detectable
    cfg = RandAugmentConfig(magnitude=9, num_layers=1, mstd=0.0, prob=0.5)
    cfg.ops = [lambda img, m, k: 255.0 - img]
    x = jnp.full((256, 4, 4, 3), 10.0)
    out = rand_augment_batch(x, jax.random.key(0), cfg)
    changed = float((jnp.abs(out - x).max(axis=(1, 2, 3)) > 1).mean())
    assert 0.40 < changed < 0.60, changed


def test_mixup_prob_zero_is_identity():
    cfg = MixupConfig(mixup_alpha=0.8, num_classes=3, prob=0.0, label_smoothing=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8, 8, 3)), jnp.float32)
    y = jnp.arange(6) % 3
    mixed, targets = mixup_cutmix(x, y, jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(targets),
                               np.asarray(jax.nn.one_hot(y, 3)), atol=1e-6)


def test_abel_latent_ops_lighting_gray_and_sample_pairing():
    from imageclassification_tpu.data.abel import lighting_gray, sample_pairing

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 255, (12, 12, 3)), jnp.float32)
    other = jnp.asarray(rng.integers(0, 255, (12, 12, 3)), jnp.float32)

    gray = lighting_gray(img, jax.random.key(0))
    assert gray.shape == img.shape
    # grayscale: all three channels identical
    np.testing.assert_allclose(np.asarray(gray[..., 0]),
                               np.asarray(gray[..., 1]), atol=1e-4)
    assert 0.0 <= float(gray.min()) and float(gray.max()) <= 255.0

    mixed = sample_pairing(img, other, jax.random.key(1))
    # blend weight in [0, 0.4]: output between img and a 40/60 mix
    w_implied = np.asarray((mixed - img) / np.where(
        np.abs(other - img) < 1e-6, 1.0, other - img))
    valid = np.abs(np.asarray(other - img)) > 1e-6
    w = w_implied[valid]
    assert w.min() > -1e-5 and w.max() < 0.4 + 1e-5
    assert np.allclose(w, w.flat[0], atol=1e-5)  # single weight per call


def test_color_jitter_fused_matches_op_chain():
    """The composed color_jitter_batch expression must equal chaining the
    PIL-golden I.adjust_brightness/contrast/saturation ops (same per-sample
    factors drawn from the same keys)."""
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.data.augment import color_jitter_batch
    from imageclassification_tpu.ops import image as I

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 17, 23, 3)), jnp.float32)
    key = jax.random.key(42)
    strength = 0.4

    got = color_jitter_batch(imgs, key, strength)

    kb, kc, ks = jax.random.split(key, 3)
    lo, hi = 1.0 - strength, 1.0 + strength
    fb = jax.random.uniform(kb, (4, 1, 1, 1), minval=lo, maxval=hi)[:, 0, 0, 0]
    fc = jax.random.uniform(kc, (4, 1, 1, 1), minval=lo, maxval=hi)[:, 0, 0, 0]
    fs = jax.random.uniform(ks, (4, 1, 1, 1), minval=lo, maxval=hi)[:, 0, 0, 0]
    want = jax.vmap(I.adjust_brightness)(imgs, fb)
    want = jax.vmap(I.adjust_contrast)(want, fc)
    want = jax.vmap(I.adjust_saturation)(want, fs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_randaugment_rejects_unknown_tokens():
    """timm asserts on unknown config sections; a typo must not silently
    train with default augmentation."""
    import pytest as _pytest

    from imageclassification_tpu.data.randaugment import (
        AutoAugmentConfig, parse_policy,
    )

    with _pytest.raises(ValueError, match="unknown RandAugment token"):
        parse_policy("rand-m9-std0.5")  # typo: std vs mstd
    with _pytest.raises(ValueError, match="unknown AutoAugment policy"):
        AutoAugmentConfig("augmix-m5")
    # the valid spellings still parse
    cfg = parse_policy("rand-m7-mstd0.5-inc1-n3-p0.4")
    assert cfg.magnitude == 7 and cfg.mstd == 0.5 and cfg.num_layers == 3
    assert cfg.increasing and cfg.prob == 0.4


def test_posterize_level_maps_match_timm():
    """timm level maps: 'Posterize' (rand non-inc, AA v0) keeps 0-4 bits;
    PosterizeIncreasing keeps 4-0 (reaching black); PosterizeOriginal
    (AA 'original' table) keeps 4-8."""
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.data import randaugment as ra

    img = jnp.full((4, 4, 3), 255.0)
    k = jax.random.key(0)
    # magnitude 10: plain -> 4 bits kept (240), inc -> 0 bits (black),
    # original -> 8 bits (unchanged)
    assert float(ra._op_posterize(img, 10.0, k).max()) == 240.0
    assert float(ra._op_posterize_inc(img, 10.0, k).max()) == 0.0
    assert float(ra._op_posterize_original(img, 10.0, k).max()) == 255.0
    # magnitude 0: plain -> 0 bits (black), inc -> 4 bits, original -> 4 bits
    assert float(ra._op_posterize(img, 0.0, k).max()) == 0.0
    assert float(ra._op_posterize_inc(img, 0.0, k).max()) == 240.0
    assert float(ra._op_posterize_original(img, 0.0, k).max()) == 240.0
    # AA original's op table routes Posterize to the 4-8 map
    cfg = ra.AutoAugmentConfig("original")
    pos = ra._OP_NAME_TO_INDEX["Posterize"]
    assert cfg.ops[pos] is ra._op_posterize_original
    assert ra.AutoAugmentConfig("v0").ops[pos] is ra._op_posterize


def test_timm_extra_rand_tokens_accepted():
    """timm also accepts w<idx> (weight set), mmax<val>, t<count> tokens —
    a reference-valid policy string like 'rand-m9-n3-w0' must parse, not
    abort training (they are ignored with a warning here)."""
    from imageclassification_tpu.data.randaugment import parse_policy

    cfg = parse_policy("rand-m9-n3-w0")
    assert cfg.magnitude == 9 and cfg.num_layers == 3
    cfg = parse_policy("rand-m9-mstd0.5-mmax20-t10")
    assert cfg.magnitude == 9 and cfg.mstd == 0.5
    # mmax raises the magnitude CLIP bound (timm magnitude_max semantics)
    assert cfg.mmax == 20.0
    assert parse_policy("rand-m9").mmax == 10.0
