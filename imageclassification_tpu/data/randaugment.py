"""On-device RandAugment / AutoAugment (replaces the reference's host-side timm
auto_augment pipeline, datasets.py:131 `auto_augment=args.aa`, plus the custom
AbelAugment op set from abel_augmentations.py).

Policy strings match timm: 'rand-m9-mstd0.5-inc1' → RandAugment with magnitude
9, magnitude-std 0.5, the "increasing severity" op set. Per-sample randomness
comes from counter-based jax.random keys (the reference relies on per-worker
Python `random`, abel_augmentations.py:318 — not reproducible across workers);
op selection is a `lax.switch`, so the full op set compiles once and the chosen
branch executes per sample under vmap.

Magnitude→argument mappings follow timm's level functions (translate_const /
img_mean hparams included); ops run on float [0,255] images via ops.image.
"""

from __future__ import annotations

import re
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as I

_LEVEL_DENOM = 10.0
# numpy (not jnp): a module-level device array would initialize the PJRT
# backend at import, before CLIs can pin --device cpu
FILL = np.array([124.0, 116.0, 104.0], np.float32)  # round(255*IMAGENET_MEAN), timm default


def _rand_sign(rng, v):
    return jnp.where(jax.random.bernoulli(rng), v, -v)


def _enhance_inc_factor(rng, m):
    v = (m / _LEVEL_DENOM) * 0.9
    return jnp.maximum(0.1, 1.0 + _rand_sign(rng, v))


def _enhance_factor(rng, m):
    # non-increasing variant: (m/10)*1.8 + 0.1, no sign flip
    del rng
    return (m / _LEVEL_DENOM) * 1.8 + 0.1


# Each op: (img [H,W,3] float 0..255, magnitude scalar, rng) -> img.
def _op_autocontrast(img, m, rng):
    return I.autocontrast(img)


def _op_equalize(img, m, rng):
    return I.equalize(img)


def _op_invert(img, m, rng):
    return I.invert(img)


def _op_rotate(img, m, rng):
    deg = _rand_sign(rng, (m / _LEVEL_DENOM) * 30.0)
    return I.rotate(img, deg, FILL)


def _op_posterize_inc(img, m, rng):
    # timm PosterizeIncreasing: 4 - int(m/10*4) bits kept, reaching 0 (black)
    # at magnitude 10 — no floor-of-1 clamp
    bits = 4 - jnp.floor((m / _LEVEL_DENOM) * 4).astype(jnp.int32)
    return I.posterize(img, jnp.clip(bits, 0, 8))


def _op_posterize(img, m, rng):
    # timm 'Posterize' (rand non-inc + AA v0): int(m/10*4) bits kept (0-4).
    # The 4-8 map belongs to PosterizeOriginal (AA 'original' policy) below.
    bits = jnp.floor((m / _LEVEL_DENOM) * 4).astype(jnp.int32)
    return I.posterize(img, jnp.clip(bits, 0, 8))


def _op_posterize_original(img, m, rng):
    # timm PosterizeOriginal (AutoAugment paper's ImageNet policy): 4-8 bits
    bits = jnp.floor((m / _LEVEL_DENOM) * 4).astype(jnp.int32) + 4
    return I.posterize(img, jnp.clip(bits, 0, 8))


def _op_solarize_inc(img, m, rng):
    thresh = 256.0 - jnp.floor((m / _LEVEL_DENOM) * 256.0)
    return I.solarize(img, thresh)


def _op_solarize(img, m, rng):
    return I.solarize(img, jnp.floor((m / _LEVEL_DENOM) * 256.0))


def _op_solarize_add(img, m, rng):
    return I.solarize_add(img, jnp.floor((m / _LEVEL_DENOM) * 110.0))


def _op_color_inc(img, m, rng):
    return I.adjust_saturation(img, _enhance_inc_factor(rng, m))


def _op_contrast_inc(img, m, rng):
    return I.adjust_contrast(img, _enhance_inc_factor(rng, m))


def _op_brightness_inc(img, m, rng):
    return I.adjust_brightness(img, _enhance_inc_factor(rng, m))


def _op_sharpness_inc(img, m, rng):
    return I.adjust_sharpness(img, _enhance_inc_factor(rng, m))


def _op_color(img, m, rng):
    return I.adjust_saturation(img, _enhance_factor(rng, m))


def _op_contrast(img, m, rng):
    return I.adjust_contrast(img, _enhance_factor(rng, m))


def _op_brightness(img, m, rng):
    return I.adjust_brightness(img, _enhance_factor(rng, m))


def _op_sharpness(img, m, rng):
    return I.adjust_sharpness(img, _enhance_factor(rng, m))


def _op_shear_x(img, m, rng):
    return I.shear_x(img, _rand_sign(rng, (m / _LEVEL_DENOM) * 0.3), FILL)


def _op_shear_y(img, m, rng):
    return I.shear_y(img, _rand_sign(rng, (m / _LEVEL_DENOM) * 0.3), FILL)


def _op_translate_x_rel(img, m, rng):
    W = img.shape[1]
    return I.translate_x(img, _rand_sign(rng, (m / _LEVEL_DENOM) * 0.45 * W), FILL)


def _op_translate_y_rel(img, m, rng):
    H = img.shape[0]
    return I.translate_y(img, _rand_sign(rng, (m / _LEVEL_DENOM) * 0.45 * H), FILL)


def _op_identity(img, m, rng):
    return img


# timm _RAND_INCREASING_TRANSFORMS order
_RAND_INC_OPS: List[Callable] = [
    _op_autocontrast, _op_equalize, _op_invert, _op_rotate, _op_posterize_inc,
    _op_solarize_inc, _op_solarize_add, _op_color_inc, _op_contrast_inc,
    _op_brightness_inc, _op_sharpness_inc, _op_shear_x, _op_shear_y,
    _op_translate_x_rel, _op_translate_y_rel,
]

# timm _RAND_TRANSFORMS (non-increasing level maps)
_RAND_OPS: List[Callable] = [
    _op_autocontrast, _op_equalize, _op_invert, _op_rotate, _op_posterize,
    _op_solarize, _op_solarize_add, _op_color, _op_contrast, _op_brightness,
    _op_sharpness, _op_shear_x, _op_shear_y, _op_translate_x_rel,
    _op_translate_y_rel,
]


class RandAugmentConfig:
    def __init__(self, magnitude=10.0, num_layers=2, mstd=0.5, increasing=False,
                 prob=0.5, mmax=10.0):
        # magnitude defaults to 10 like timm's _RAND defaults, so policy
        # strings without an mN token (e.g. 'rand-mstd0.5') match timm;
        # mstd defaults to 0.5 (timm AugmentOp's magnitude_std default) —
        # the reference's own default policy pins mstd0.5 explicitly anyway
        # (train.py:62 'rand-m9-mstd0.5-inc1')
        self.magnitude = magnitude
        self.num_layers = num_layers
        self.mstd = mstd
        self.increasing = increasing
        self.prob = prob
        # timm magnitude_max: the sampled magnitude is clipped to
        # [0, mmax] while level maps stay on the /10 scale, so mmax>10
        # scales ops beyond their nominal ranges (timm auto_augment.py)
        self.mmax = mmax
        self.ops = _RAND_INC_OPS if increasing else _RAND_OPS


def parse_policy(aa: str) -> RandAugmentConfig:
    """Parse a timm-style auto-augment string. 'rand-*' → RandAugment config.
    ('v0'/'original' AutoAugment policy tables route through the same op set;
    see auto_augment_policy below.)"""
    if not aa.startswith("rand"):
        raise ValueError(f"Only rand-* policies parsed here, got {aa!r}")
    cfg = RandAugmentConfig()
    for tok in aa.split("-")[1:]:
        if m := re.match(r"mstd([\d.]+)$", tok):
            cfg.mstd = float(m.group(1))
        elif m := re.match(r"m(\d+)$", tok):
            cfg.magnitude = float(m.group(1))
        elif m := re.match(r"n(\d+)$", tok):
            cfg.num_layers = int(m.group(1))
        elif m := re.match(r"inc(\d+)$", tok):
            cfg.increasing = bool(int(m.group(1)))
        elif m := re.match(r"p([\d.]+)$", tok):
            cfg.prob = float(m.group(1))
        elif m := re.match(r"mmax(\d+)$", tok):
            # timm magnitude_max: raise the magnitude clip bound above 10
            # (level maps stay on the /10 scale, matching timm exactly)
            cfg.mmax = float(m.group(1))
        elif re.match(r"w(\d+)$", tok):
            # timm: selects a hand-tuned probability-weight set for op
            # sampling; we sample ops uniformly like the default timm path.
            print(f"RandAugment: token {tok!r} accepted but ignored "
                  "(uniform op sampling)")
        elif re.match(r"t(\d+)$", tok):
            # timm: number of transforms available — superseded by the op
            # lists themselves here.
            print(f"RandAugment: token {tok!r} accepted but ignored")
        else:
            # timm asserts on unknown config sections — a typo like
            # 'std0.5' must not silently train with default augmentation
            raise ValueError(f"unknown RandAugment token {tok!r} in {aa!r}")
    cfg.ops = _RAND_INC_OPS if cfg.increasing else _RAND_OPS
    return cfg


# Geometric ops share one affine resample (see rand_augment_image): op index →
# affine coefficient builder. Indices refer to positions in the op lists above.
_GEOM_INDICES = {3: "rotate", 11: "shear_x", 12: "shear_y",
                 13: "translate_x", 14: "translate_y"}


def _affine_coeffs(op_idx, m, rng, H, W):
    """Coefficients for the op's affine map; identity when op is non-geometric.
    Computing all five candidate matrices and selecting is ~15 scalar FLOPs —
    vastly cheaper to compile than five separate gather branches."""
    sv = _rand_sign(rng, (m / _LEVEL_DENOM) * 0.3)
    tx = _rand_sign(jax.random.fold_in(rng, 1), (m / _LEVEL_DENOM) * 0.45 * W)
    ty = _rand_sign(jax.random.fold_in(rng, 2), (m / _LEVEL_DENOM) * 0.45 * H)
    deg = _rand_sign(jax.random.fold_in(rng, 3), (m / _LEVEL_DENOM) * 30.0)
    theta = jnp.deg2rad(deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    rot = jnp.array([cos, sin, cx - cos * cx - sin * cy,
                     -sin, cos, cy + sin * cx - cos * cy])
    identity = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    cands = jnp.stack([
        identity,
        rot,                                                   # rotate
        jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]) + jnp.array([0, 1, 0, 0, 0, 0]) * sv,  # shear_x
        jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]) + jnp.array([0, 0, 0, 1, 0, 0]) * sv,  # shear_y
        jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]) + jnp.array([0, 0, 1, 0, 0, 0]) * tx,  # translate_x
        jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]) + jnp.array([0, 0, 0, 0, 0, 1]) * ty,  # translate_y
    ])
    sel = jnp.select(
        [op_idx == 3, op_idx == 11, op_idx == 12, op_idx == 13, op_idx == 14],
        [1, 2, 3, 4, 5],
        0,
    )
    return cands[sel], sel > 0


def _apply_op(img, op_idx, m, rng, ops):
    """Apply op `op_idx` (traced) at magnitude `m` to one image.

    Compile-friendly structure: the five geometric ops all route through ONE
    shared `affine_inverse` gather (matrix selected per sample); only the ten
    pixel ops live in the lax.switch. Under vmap the switch lowers to batched
    ops + selects, so the graph stays at ~10 cheap batched pixel ops + one
    gather per application instead of five gather branches."""
    H, W, _ = img.shape
    pixel_ops = [f for i, f in enumerate(ops) if i not in _GEOM_INDICES]
    pixel_branches = [
        (lambda f: (lambda a: f(a[0], a[1], a[2])))(f) for f in pixel_ops
    ]
    pixel_index = []
    j = 0
    for i in range(len(ops)):
        if i in _GEOM_INDICES:
            pixel_index.append(0)
        else:
            pixel_index.append(j)
            j += 1
    pixel_index = jnp.asarray(pixel_index)

    coeffs, is_geom = _affine_coeffs(op_idx, m, rng, H, W)
    geom_out = I.affine_inverse(img, tuple(coeffs), FILL)
    pixel_out = jax.lax.switch(pixel_index[op_idx], pixel_branches, (img, m, rng))
    return jnp.where(is_geom, geom_out, pixel_out)


def rand_augment_image(img, rng, cfg: RandAugmentConfig):
    """Apply `num_layers` randomly-chosen ops to one image (timm RandAugment:
    each chosen op applies with prob 0.5; magnitude ~ N(m, mstd) clipped)."""
    for layer in range(cfg.num_layers):
        k_op, k_mag, k_apply, k_inner, rng = jax.random.split(rng, 5)
        op_idx = jax.random.randint(k_op, (), 0, len(cfg.ops))
        if cfg.mstd > 0:
            m = cfg.magnitude + cfg.mstd * jax.random.normal(k_mag)
        else:
            m = jnp.asarray(cfg.magnitude, jnp.float32)
        m = jnp.clip(m, 0.0, cfg.mmax)
        out = _apply_op(img, op_idx, m, k_inner, cfg.ops)
        apply = jax.random.bernoulli(k_apply, cfg.prob)
        img = jnp.where(apply, out, img)
    return img


def rand_augment_batch(images, rng, cfg: RandAugmentConfig):
    """vmap over the batch with per-sample keys."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda im, k: rand_augment_image(im, k, cfg))(images, keys)


# ---------------------------------------------------------------------------
# AutoAugment policies ('original'/'v0', reference --aa choices train.py:62)
# ---------------------------------------------------------------------------

# The AutoAugment ImageNet policy (Cubuk et al. 2019, Table 9): 25 sub-policies
# of two (op, prob, magnitude) applications; magnitudes on the 0-10 scale with
# the NON-increasing level maps (_RAND_OPS). Names map into _RAND_OPS indices.
_AA_ORIGINAL = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, 4), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, 7)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, 2)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, 8), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, 2)),
    (("Equalize", 0.0, 7), ("Equalize", 0.8, 8)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, 8)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, 9)),
    (("Color", 0.4, 0), ("Equalize", 0.6, 3)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
]

# Google policy_v0 (TF AutoAugment reference implementation)
_AA_V0 = [
    (("Equalize", 0.8, 1), ("ShearY", 0.8, 4)),
    (("Color", 0.4, 9), ("Equalize", 0.6, 3)),
    (("Color", 0.4, 1), ("Rotate", 0.6, 8)),
    (("Solarize", 0.8, 3), ("Equalize", 0.4, 7)),
    (("Solarize", 0.4, 2), ("Solarize", 0.6, 2)),
    (("Color", 0.2, 0), ("Equalize", 0.8, 8)),
    (("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)),
    (("ShearX", 0.2, 9), ("Rotate", 0.6, 8)),
    (("Color", 0.6, 1), ("Equalize", 1.0, 2)),
    (("Invert", 0.4, 9), ("Rotate", 0.6, 0)),
    (("Equalize", 1.0, 9), ("ShearY", 0.6, 3)),
    (("Color", 0.4, 7), ("Equalize", 0.6, 0)),
    (("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)),
    (("Solarize", 0.6, 8), ("Color", 0.6, 9)),
    (("Solarize", 0.2, 4), ("Rotate", 0.8, 9)),
    (("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)),
    (("ShearX", 0.0, 0), ("Solarize", 0.8, 4)),
    (("ShearY", 0.8, 0), ("Color", 0.6, 4)),
    (("Color", 1.0, 0), ("Rotate", 0.6, 2)),
    (("Equalize", 0.8, 4), ("Equalize", 0.0, 8)),
    (("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)),
    (("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)),
    (("Posterize", 0.8, 2), ("Solarize", 0.6, 10)),
    (("Solarize", 0.6, 8), ("Equalize", 0.6, 1)),
    (("Color", 0.8, 6), ("Rotate", 0.4, 5)),
]

_OP_NAME_TO_INDEX = {
    "AutoContrast": 0, "Equalize": 1, "Invert": 2, "Rotate": 3, "Posterize": 4,
    "Solarize": 5, "SolarizeAdd": 6, "Color": 7, "Contrast": 8,
    "Brightness": 9, "Sharpness": 10, "ShearX": 11, "ShearY": 12,
    "TranslateXRel": 13, "TranslateYRel": 14,
}


class AutoAugmentConfig:
    def __init__(self, policy: str = "original"):
        import numpy as _np

        if policy not in ("original", "v0"):
            # timm asserts on unknown AA policies — don't silently train
            # with the wrong augmentation (e.g. a typo or 'augmix-*')
            raise ValueError(
                f"unknown AutoAugment policy {policy!r} "
                "(supported: 'original', 'v0', 'rand-*', 'abel-*')"
            )
        table = _AA_ORIGINAL if policy != "v0" else _AA_V0
        if policy == "original":
            # the original ImageNet policy uses the 4-8 bit PosterizeOriginal
            # map; v0 (and rand) use the 0-4 'Posterize' map
            ops = list(_RAND_OPS)
            ops[_OP_NAME_TO_INDEX["Posterize"]] = _op_posterize_original
            self.ops = ops
        else:
            self.ops = _RAND_OPS
        self.op_idx = _np.array(
            [[_OP_NAME_TO_INDEX[a[0]], _OP_NAME_TO_INDEX[b[0]]] for a, b in table]
        )
        self.probs = _np.array([[a[1], b[1]] for a, b in table], _np.float32)
        self.mags = _np.array([[a[2], b[2]] for a, b in table], _np.float32)


def auto_augment_image(img, rng, cfg: AutoAugmentConfig):
    """One uniformly-chosen sub-policy; each slot applies with its prob."""
    op_idx = jnp.asarray(cfg.op_idx)
    probs = jnp.asarray(cfg.probs)
    mags = jnp.asarray(cfg.mags)
    k_sp, rng = jax.random.split(rng)
    sp = jax.random.randint(k_sp, (), 0, op_idx.shape[0])
    for slot in range(op_idx.shape[1]):
        k_apply, k_inner, rng = jax.random.split(rng, 3)
        out = _apply_op(img, op_idx[sp, slot], mags[sp, slot], k_inner, cfg.ops)
        img = jnp.where(
            jax.random.bernoulli(k_apply, probs[sp, slot]), out, img
        )
    return img


def auto_augment_batch(images, rng, cfg: AutoAugmentConfig):
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda im, k: auto_augment_image(im, k, cfg))(images, keys)
