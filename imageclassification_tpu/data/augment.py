"""On-device train/eval pixel pipeline assembly (reference C4: the timm
create_transform stack built at datasets.py:121-144, re-homed onto the TPU).

Order matches timm's train transform: [host RRC geometry] → hflip(0.5) →
vflip(0.5, reference passes vflip=0.5) → {RandAugment if --aa else ColorJitter}
→ normalize(ImageNet mean/std) → RandomErasing(reprob/remode/recount).
Eval: normalize only (host already squash-resized — datasets.py:139-144 has no
center crop).

The whole thing is one pure function of (uint8 batch, rng) that the train step
jits — zero host round trips per batch (the reference pays a Python/PIL pass
per sample in DataLoader workers).

Deviation noted for parity review: torchvision ColorJitter shuffles the order
of brightness/contrast/saturation per call; we apply in fixed order (the three
ops commute to first order — see blend() linearity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .abel import abel_augment_batch, parse_abel_policy
from .randaugment import (
    AutoAugmentConfig,
    RandAugmentConfig,
    auto_augment_batch,
    parse_policy,
    rand_augment_batch,
)

# numpy (not jnp): keep imports free of device-backend side effects
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize(images_01):
    """(x - mean) / std on [0,1]-scaled float images."""
    return (images_01 - IMAGENET_MEAN) / IMAGENET_STD


def random_flips(images, rng, hflip_prob=0.5, vflip_prob=0.5):
    B = images.shape[0]
    kh, kv = jax.random.split(rng)
    do_h = jax.random.bernoulli(kh, hflip_prob, (B, 1, 1, 1))
    do_v = jax.random.bernoulli(kv, vflip_prob, (B, 1, 1, 1))
    images = jnp.where(do_h, images[:, :, ::-1, :], images)
    images = jnp.where(do_v, images[:, ::-1, :, :], images)
    return images


def color_jitter_batch(images, rng, strength: float):
    """torchvision ColorJitter(brightness=s, contrast=s, saturation=s):
    independent uniform factors in [max(0, 1-s), 1+s] per sample.

    One flat composed expression (identical math to chaining the PIL-golden
    I.adjust_* ops — pinned by tests/test_augment.py) instead of three
    vmapped calls: the batched ops each materialized a full [B,H,W,3] fp32
    intermediate; composed, XLA fuses everything around the one contrast
    mean-reduce (~1 ms/step less HBM traffic at batch 128)."""
    B = images.shape[0]
    kb, kc, ks = jax.random.split(rng, 3)
    lo = max(0.0, 1.0 - strength)
    hi = 1.0 + strength
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=lo, maxval=hi)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=lo, maxval=hi)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=lo, maxval=hi)
    x = images.astype(jnp.float32)
    b = jnp.clip(x * fb, 0.0, 255.0)                       # brightness
    gray_b = b[..., 0] * 0.299 + b[..., 1] * 0.587 + b[..., 2] * 0.114
    m = jnp.round(jnp.mean(jnp.round(gray_b), axis=(1, 2)))
    m = m[:, None, None, None]
    c = jnp.clip(m + fc * (b - m), 0.0, 255.0)             # contrast
    gray_c = c[..., 0] * 0.299 + c[..., 1] * 0.587 + c[..., 2] * 0.114
    gray_c = gray_c[..., None]
    return jnp.clip(gray_c + fs * (c - gray_c), 0.0, 255.0)  # saturation


def random_erasing(images, rng, prob=0.25, mode="pixel", count=1,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 10 / 3)):
    """timm RandomErasing on NORMALIZED images: per sample, with `prob`, erase
    `count` rectangles with per-pixel N(0,1) noise ('pixel' mode), a constant 0
    ('const'), or per-sample N(0,1) per channel ('rand')."""
    B, H, W, C = images.shape
    log_aspect = (jnp.log(aspect_range[0]), jnp.log(aspect_range[1]))

    def erase_one(img, key):
        k_on, key = jax.random.split(key)
        enabled = jax.random.bernoulli(k_on, prob)

        def body(i, im):
            k = jax.random.fold_in(key, i)
            ka, kr, ky, kx, kn = jax.random.split(k, 5)
            area = H * W
            target = area * jax.random.uniform(
                ka, minval=area_range[0], maxval=area_range[1]
            ) / count
            aspect = jnp.exp(
                jax.random.uniform(kr, minval=log_aspect[0], maxval=log_aspect[1])
            )
            h = jnp.sqrt(target * aspect).astype(jnp.int32)
            w = jnp.sqrt(target / aspect).astype(jnp.int32)
            fits = (h < H) & (w < W)
            h = jnp.clip(h, 1, H - 1)
            w = jnp.clip(w, 1, W - 1)
            top = jax.random.randint(ky, (), 0, H)
            left = jax.random.randint(kx, (), 0, W)
            top = jnp.minimum(top, H - h)
            left = jnp.minimum(left, W - w)
            ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            mask = ((ys >= top) & (ys < top + h) & (xs >= left) & (xs < left + w))
            mask = (mask & fits & enabled)[..., None]
            if mode == "pixel":
                fill = jax.random.normal(kn, (H, W, C))
            elif mode == "rand":
                fill = jnp.broadcast_to(jax.random.normal(kn, (1, 1, C)), (H, W, C))
            else:  # 'const'
                fill = jnp.zeros((H, W, C))
            return jnp.where(mask, fill, im)

        for i in range(count):
            img = body(i, img)
        return img

    keys = jax.random.split(rng, B)
    return jax.vmap(erase_one)(images, keys)


class AugmentPipeline:
    """Compiled-in train-time pixel pipeline; configured once from args."""

    def __init__(self, args):
        self.color_jitter = args.color_jitter
        self.aa = None
        self.aa_kind = ""
        self.aa_name = args.aa
        if args.aa:
            if args.aa.startswith("rand"):
                self.aa = parse_policy(args.aa)
                self.aa_kind = "rand"
            elif args.aa.startswith("abel"):
                # reference AbelAugment (abel_augmentations.py; latent in the
                # reference, reachable here via --aa abel-nN)
                self.aa = parse_abel_policy(args.aa)
                self.aa_kind = "abel"
            else:
                # 'v0' / 'original' AutoAugment policy tables
                self.aa = AutoAugmentConfig(args.aa)
                self.aa_kind = "auto"
        self.reprob = args.reprob
        self.remode = args.remode
        self.recount = args.recount

    def __call__(self, images_u8, rng):
        """uint8 [B,H,W,3] → normalized float32 [B,H,W,3]."""
        k_flip, k_aa, k_erase = jax.random.split(rng, 3)
        # flip while still uint8 — the materialized `rev` tensors cost 4x
        # less HBM traffic than after the float32 conversion
        x = random_flips(images_u8, k_flip, 0.5, 0.5)
        x = x.astype(jnp.float32)
        if self.aa_kind == "rand":
            x = rand_augment_batch(x, k_aa, self.aa)
        elif self.aa_kind == "abel":
            x = abel_augment_batch(x, k_aa, self.aa)
        elif self.aa_kind == "auto":
            x = auto_augment_batch(x, k_aa, self.aa)
        elif self.color_jitter and self.color_jitter > 0:
            x = color_jitter_batch(x, k_aa, self.color_jitter)
        x = normalize(x / 255.0)
        if self.reprob and self.reprob > 0:
            x = random_erasing(x, k_erase, self.reprob, self.remode, self.recount)
        return x


def eval_preprocess(images_u8):
    """Eval pixel path: normalize only (host did the squash resize)."""
    return normalize(images_u8.astype(jnp.float32) / 255.0)
