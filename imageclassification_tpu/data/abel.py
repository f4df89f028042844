"""AbelAugment — the reference's custom augmentation op set (C5:
abel_augmentations.py), on device.

Reference behavior reproduced (abel_augmentations.py:312-327):
  * `AbelAugment(n)`: with prob 0.3 apply `set_dark_pixels_to_zero(1,
    randint(1,10))`; with prob 0.1 stop (identity); else apply n ops sampled
    with replacement from the ACTIVE list — Sharpness(0.4,1.9),
    ShearX(0,0.1), ShearY(0,0.1) (the rest of the 20-op zoo is commented out
    upstream, :203-224);
  * custom LUT ops kept for completeness: `set_dark_pixels_to_zero`
    (threshold-to-black, :92-101), `Anti_Solarize` (invert pixels <= threshold,
    :109-119), `SolarizeAdd` (+uniform(0,120) then solarize);
  * `Lighting` PCA noise (:227-250) with the standard ImageNet eigen-decomp;
  * `CutoutDefault`/`CutoutAbs` gray-fill square (:272-295).

The reference defines these but never wires them into build_transform
(datasets.py imports at :7, unused). Here they're reachable: pass
`--aa abel-n2` to use AbelAugment(2) as the train policy.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as I

# ImageNet PCA lighting (standard AlexNet eigendecomposition)
# numpy (not jnp): module-level device arrays would initialize the
# PJRT backend at import, before CLIs can pin --device cpu
LIGHTING_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
LIGHTING_EIGVEC = np.array([
    [-0.5675, 0.7192, 0.4009],
    [-0.5808, -0.0045, -0.8140],
    [-0.5836, -0.6948, 0.4203],
])


def set_dark_pixels_to_zero(img, threshold):
    """Pixels below `threshold` → 0 (reference :92-101)."""
    return jnp.where(img < threshold, 0.0, img)


def anti_solarize(img, threshold):
    """Invert pixels <= threshold (reference Anti_Solarize custom LUT)."""
    return jnp.where(img > threshold, img, 255.0 - img)


def solarize_add_abel(img, threshold, addition):
    """img + addition (clipped) then solarize at threshold (reference :121-129)."""
    return I.solarize(jnp.clip(img + addition, 0.0, 255.0), threshold)


def lighting(img, rng, alphastd=0.1):
    """PCA color noise: img + eigvec @ (alpha * eigval) (reference :227-250)."""
    alpha = jax.random.normal(rng, (3,)) * alphastd
    delta = LIGHTING_EIGVEC @ (alpha * LIGHTING_EIGVAL) * 255.0
    return jnp.clip(img + delta, 0.0, 255.0)


def cutout_abs(img, rng, size, fill=127.0):
    """Gray square of side `size` at a uniform center (reference CutoutAbs)."""
    H, W, _ = img.shape
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    return I.cutout(img, size // 2, cy, cx, fill)


def lighting_gray(img, rng, alphastd=0.1):
    """Grayscale PCA lighting (reference LightingGray, :252-269): the PCA
    delta is computed as in `lighting`, then the image+delta is converted to
    luminance (ITU-R 601) and broadcast back to 3 channels."""
    lit = lighting(img, rng, alphastd)
    gray = (lit @ jnp.array([0.299, 0.587, 0.114]))[..., None]
    return jnp.clip(jnp.broadcast_to(gray, lit.shape), 0.0, 255.0)


def sample_pairing(img, other, rng, weight_range=(0.0, 0.4)):
    """SamplePairing (reference :~186): blend a second training image in with
    a uniform weight — labels unchanged (unlike mixup). `other` is typically
    the batch-reversed partner."""
    w = jax.random.uniform(rng, minval=weight_range[0], maxval=weight_range[1])
    return (1.0 - w) * img + w * other


class AbelAugmentConfig:
    def __init__(self, n: int = 2):
        self.n = n


def parse_abel_policy(aa: str) -> AbelAugmentConfig:
    """'abel' or 'abel-n2' → AbelAugment(n)."""
    n = 2
    if m := re.search(r"n(\d+)", aa):
        n = int(m.group(1))
    return AbelAugmentConfig(n)


def abel_augment_image(img, rng, cfg: AbelAugmentConfig):
    k_dark, k_dark_t, k_skip, rng = jax.random.split(rng, 4)

    # 30%: dark-to-zero with threshold randint(1, randint(1,10)) — the
    # reference draws the max first then the threshold (randint inclusive)
    k_max, k_thr = jax.random.split(k_dark_t)
    tmax = jax.random.randint(k_max, (), 1, 11)
    thr = jax.random.randint(k_thr, (), 1, tmax + 1).astype(jnp.float32)
    dark = set_dark_pixels_to_zero(img, thr)
    img = jnp.where(jax.random.bernoulli(k_dark, 0.3), dark, img)

    skip = jax.random.bernoulli(k_skip, 0.1)

    out = img
    for _ in range(cfg.n):
        k_op, k_v, k_sign, rng = jax.random.split(rng, 4)
        op_idx = jax.random.randint(k_op, (), 0, 3)
        # op 0: Sharpness(0.4, 1.9); op 1: ShearX(0, 0.1)±; op 2: ShearY(0, 0.1)±
        v_sharp = jax.random.uniform(k_v, minval=0.4, maxval=1.9)
        v_shear = jax.random.uniform(k_v, minval=0.0, maxval=0.1)
        v_shear = jnp.where(jax.random.bernoulli(k_sign), v_shear, -v_shear)
        fill = jnp.array([128.0, 128.0, 128.0])
        sharp = I.adjust_sharpness(out, v_sharp)
        shx = I.shear_x(out, v_shear, fill)
        shy = I.shear_y(out, v_shear, fill)
        out = jax.lax.switch(op_idx, [lambda a=sharp: a, lambda a=shx: a, lambda a=shy: a])

    return jnp.where(skip, img, out)


def abel_augment_batch(images, rng, cfg: AbelAugmentConfig):
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda im, k: abel_augment_image(im, k, cfg))(images, keys)
