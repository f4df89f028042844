"""On-device mixup/cutmix + soft-target construction (reference C6:
timm.data.Mixup built at train.py:172-185 with mixup_alpha/cutmix_alpha/
cutmix_minmax/prob/switch_prob/mode + label smoothing folded into the targets).

timm semantics reproduced:
  * lam ~ Beta(alpha, alpha); applied with prob `mixup_prob`; when both mixup
    and cutmix are enabled, cutmix is chosen with prob `switch_prob`;
  * 'batch' mode: one lam for the whole batch, partner = batch reversed;
    'elem': per-sample lam; 'pair': one lam per (i, B-1-i) pair (symmetric);
  * cutmix: square-root-area bbox around a uniform center, lam corrected to the
    realized box area (timm correct_lam=True); cutmix_minmax overrides the
    bbox to a uniform ratio in [minmax] per side;
  * targets: one-hot with label smoothing (on = 1-s+s/C, off = s/C), mixed with
    the SAME lam.

Everything is branch-free jnp (where/select) so it fuses into the train step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def one_hot_smooth(labels, num_classes: int, smoothing: float = 0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, H: int, W: int, lam):
    """timm rand_bbox: cut ratio sqrt(1-lam), center uniform, clipped box.
    Returns (yl, yh, xl, xh) and the corrected lam (realized area)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    yl = jnp.clip(cy - cut_h // 2, 0, H)
    yh = jnp.clip(cy + cut_h // 2, 0, H)
    xl = jnp.clip(cx - cut_w // 2, 0, W)
    xh = jnp.clip(cx + cut_w // 2, 0, W)
    lam_corrected = 1.0 - ((yh - yl) * (xh - xl)).astype(jnp.float32) / (H * W)
    return (yl, yh, xl, xh), lam_corrected


def _rand_bbox_minmax(rng, H: int, W: int, minmax):
    """timm rand_bbox_minmax: per-side uniform ratio in [min, max]."""
    kh, kw, ky, kx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(kh, (), int(H * minmax[0]), int(H * minmax[1]))
    cut_w = jax.random.randint(kw, (), int(W * minmax[0]), int(W * minmax[1]))
    yl = jax.random.randint(ky, (), 0, H - cut_h)
    xl = jax.random.randint(kx, (), 0, W - cut_w)
    lam = 1.0 - (cut_h * cut_w).astype(jnp.float32) / (H * W)
    return (yl, yl + cut_h, xl, xl + cut_w), lam


def _box_mask(H: int, W: int, box):
    yl, yh, xl, xh = box
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return ((ys >= yl) & (ys < yh) & (xs >= xl) & (xs < xh))[..., None]


class MixupConfig:
    def __init__(self, mixup_alpha=0.8, cutmix_alpha=0.0, cutmix_minmax=None,
                 prob=1.0, switch_prob=0.5, mode="batch", label_smoothing=0.1,
                 num_classes=1000):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.cutmix_minmax = cutmix_minmax
        self.prob = prob
        self.switch_prob = switch_prob
        self.mode = mode
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    @property
    def active(self) -> bool:
        # reference activation condition (train.py:173)
        return (self.mixup_alpha > 0 or self.cutmix_alpha > 0
                or self.cutmix_minmax is not None)


def _sample_lam(rng, cfg: MixupConfig, shape=()):
    """Sample (lam, use_cutmix) honoring prob/switch_prob/alphas."""
    k_use, k_switch, k_beta = jax.random.split(rng, 3)
    both = cfg.mixup_alpha > 0 and (cfg.cutmix_alpha > 0 or cfg.cutmix_minmax)
    if both:
        use_cutmix = jax.random.bernoulli(k_switch, cfg.switch_prob, shape)
        alpha = jnp.where(use_cutmix, cfg.cutmix_alpha, cfg.mixup_alpha)
    elif cfg.cutmix_alpha > 0 or cfg.cutmix_minmax is not None:
        use_cutmix = jnp.ones(shape, bool)
        alpha = jnp.full(shape, cfg.cutmix_alpha if cfg.cutmix_alpha > 0 else 1.0)
    else:
        use_cutmix = jnp.zeros(shape, bool)
        alpha = jnp.full(shape, cfg.mixup_alpha)
    lam = jax.random.beta(k_beta, alpha, alpha, shape)
    enabled = jax.random.bernoulli(k_use, cfg.prob, shape)
    lam = jnp.where(enabled, lam, 1.0)
    return lam.astype(jnp.float32), use_cutmix & enabled


def mixup_cutmix(images, labels, rng, cfg: MixupConfig):
    """Apply mixup/cutmix; returns (mixed images, soft targets [B, C]).

    images: float [B, H, W, C] (any pre/post-normalize point works — the op is
    linear); labels: int [B]."""
    B, H, W, _ = images.shape
    y = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    flipped = images[::-1]
    y_flipped = y[::-1]

    if cfg.mode == "batch":
        k_lam, k_box = jax.random.split(rng)
        lam, use_cutmix = _sample_lam(k_lam, cfg)
        if cfg.cutmix_minmax is not None:
            box, lam_cut = _rand_bbox_minmax(k_box, H, W, cfg.cutmix_minmax)
        else:
            box, lam_cut = _rand_bbox(k_box, H, W, lam)
        mask = _box_mask(H, W, box)
        cut_imgs = jnp.where(mask, flipped, images)
        mix_lam = jnp.where(use_cutmix, 1.0, lam)  # pixel mixing only for mixup
        mixed = mix_lam * images + (1.0 - mix_lam) * flipped
        mixed = jnp.where(use_cutmix, cut_imgs, mixed)
        lam_final = jnp.where(use_cutmix, lam_cut, lam)
        targets = lam_final * y + (1.0 - lam_final) * y_flipped
        return mixed, targets

    # 'elem' and 'pair': per-sample lam (pair shares lam between (i, B-1-i))
    k_lam, k_box = jax.random.split(rng)
    lam, use_cutmix = _sample_lam(k_lam, cfg, (B,))
    box_keys = jax.random.split(k_box, B)
    if cfg.mode == "pair":
        # timm _mix_pair: pair (i, B-1-i) shares ONE Beta sample, one
        # cutmix/mixup choice, and one bbox — mirror the first half's draws
        # onto the second half (min-of-two-Betas would over-mix).
        first = jnp.arange(B) < B // 2
        lam = jnp.where(first, lam, lam[::-1])
        use_cutmix = jnp.where(first, use_cutmix, use_cutmix[::-1])
        kd = jax.random.key_data(box_keys)
        kd = jnp.where(first[:, None], kd, kd[::-1])
        box_keys = jax.random.wrap_key_data(kd)

    def mix_one(img, other, l, cut, k):
        if cfg.cutmix_minmax is not None:
            box, l_cut = _rand_bbox_minmax(k, H, W, cfg.cutmix_minmax)
        else:
            box, l_cut = _rand_bbox(k, H, W, l)
        mask = _box_mask(H, W, box)
        cut_img = jnp.where(mask, other, img)
        mixed = l * img + (1.0 - l) * other
        return jnp.where(cut, cut_img, mixed), jnp.where(cut, l_cut, l)

    mixed, lam_final = jax.vmap(mix_one)(images, flipped, lam, use_cutmix, box_keys)
    targets = lam_final[:, None] * y + (1.0 - lam_final[:, None]) * y_flipped
    return mixed, targets


def build_mixup(args, num_classes: int) -> Optional[MixupConfig]:
    """Mirror reference activation (train.py:172-185)."""
    cfg = MixupConfig(
        mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix,
        cutmix_minmax=args.cutmix_minmax,
        prob=args.mixup_prob,
        switch_prob=args.mixup_switch_prob,
        mode=args.mixup_mode,
        label_smoothing=args.smoothing,
        num_classes=num_classes,
    )
    return cfg if cfg.active else None
