"""Device-side image primitives (XLA; the building blocks for the on-device
RandAugment/AutoAugment pipeline replacing the reference's host-side PIL ops,
datasets.py:124-136 + abel_augmentations.py).

All ops take/return float32 images in [0, 255], shape [H, W, C] (single image —
batch via vmap; everything is shape-static and branch-free so the whole pipeline
fuses into the jit train step). Math matches PIL's integer LUT semantics to
within 1 LSB where PIL rounds; golden tests compare against PIL directly
(SURVEY §7 'hard parts': on-device augmentation parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- geometric --


def affine_inverse(img, coeffs, fill):
    """PIL-convention affine: output (x, y) samples input at
    (a x + b y + c, d x + e y + f); bilinear, out-of-bounds → fill."""
    H, W, C = img.shape
    a, b, c, d, e, f = coeffs
    # PIL samples at output pixel CENTERS: in = M @ (x+0.5, y+0.5) - 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    xin = a * xs + b * ys + c - 0.5
    yin = d * xs + e * ys + f - 0.5

    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    wx = xin - x0
    wy = yin - y0

    def gather(yc, xc):
        inb = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
        xs_ = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        ys_ = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        vals = img[ys_, xs_]  # [H, W, C] gather
        return jnp.where(inb[..., None], vals, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out


def shear_x(img, v, fill):
    return affine_inverse(img, (1.0, v, 0.0, 0.0, 1.0, 0.0), fill)


def shear_y(img, v, fill):
    return affine_inverse(img, (1.0, 0.0, 0.0, v, 1.0, 0.0), fill)


def translate_x(img, pixels, fill):
    return affine_inverse(img, (1.0, 0.0, pixels, 0.0, 1.0, 0.0), fill)


def translate_y(img, pixels, fill):
    return affine_inverse(img, (1.0, 0.0, 0.0, 0.0, 1.0, pixels), fill)


def rotate(img, degrees, fill):
    """Rotate about the image center (PIL Image.rotate convention)."""
    H, W, _ = img.shape
    theta = jnp.deg2rad(degrees)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0  # PIL rotate center convention
    # output→input: rotate by +theta about center
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return affine_inverse(img, (a, b, c, d, e, f), fill)


# -------------------------------------------------------------- photometric --


def blend(degenerate, img, factor):
    """PIL ImageEnhance: degenerate + factor * (img - degenerate), clipped."""
    return jnp.clip(degenerate + factor * (img - degenerate), 0.0, 255.0)


def grayscale(img):
    """ITU-R 601-2 luma (PIL convert('L') coefficients)."""
    l = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.broadcast_to(l[..., None], img.shape)


def adjust_brightness(img, factor):
    return blend(jnp.zeros_like(img), img, factor)


def adjust_saturation(img, factor):  # PIL 'Color'
    return blend(grayscale(img), img, factor)


def adjust_contrast(img, factor):
    # PIL: degenerate = solid gray at round(mean of L channel)
    mean = jnp.round(jnp.mean(jnp.round(grayscale(img)[..., 0])))
    return blend(jnp.full_like(img, mean), img, factor)


def adjust_sharpness(img, factor):
    """PIL SMOOTH filter (3×3 [[1,1,1],[1,5,1],[1,1,1]]/13) with border pixels
    preserved (PIL leaves the 1-pixel border untouched), then enhance-blend."""
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    x = img.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
    smooth = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), "SAME"
    )[:, 0].transpose(1, 2, 0)
    H, W, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((ys > 0) & (ys < H - 1) & (xs > 0) & (xs < W - 1))[..., None]
    degenerate = jnp.where(interior, jnp.round(smooth), img)
    return blend(degenerate, img, factor)


def invert(img):
    return 255.0 - img


def posterize(img, bits):
    """Keep the top `bits` bits (PIL ImageOps.posterize)."""
    shift = (8 - bits).astype(jnp.uint8)
    q = img.astype(jnp.uint8)
    return ((q >> shift) << shift).astype(jnp.float32)


def solarize(img, threshold):
    return jnp.where(img >= threshold, 255.0 - img, img)


def solarize_add(img, add, threshold=128.0):
    return jnp.where(img < threshold, jnp.clip(img + add, 0.0, 255.0), img)


def _channel_histogram(ch):
    """256-bin histogram of one [H, W] uint8-valued channel.

    One-hot matmul formulation — scatter-free, so it rides the MXU instead of
    serializing on TPU scatter units."""
    flat = ch.reshape(-1).astype(jnp.int32)
    onehot = jax.nn.one_hot(flat, 256, dtype=jnp.float32)
    return jnp.sum(onehot, axis=0)


def equalize(img):
    """PIL ImageOps.equalize: per-channel histogram equalization with PIL's
    exact integer LUT construction."""

    def eq_channel(ch):
        h = _channel_histogram(ch)
        # PIL: step = (total - last nonzero bin count) // 255
        nonzero = h > 0
        last_nonzero_val = jnp.max(jnp.where(nonzero, jnp.arange(256), -1))
        last_count = h[last_nonzero_val]
        step = jnp.floor((jnp.sum(h) - last_count) / 255.0)
        csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(h)[:-1]])
        lut = jnp.floor((csum + jnp.floor(step / 2)) / jnp.maximum(step, 1.0))
        lut = jnp.clip(lut, 0, 255)
        idx = ch.astype(jnp.int32)
        out = lut[idx]
        return jnp.where(step == 0, ch, out)

    chans = [eq_channel(img[..., c]) for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


def autocontrast(img):
    """PIL ImageOps.autocontrast (cutoff=0): per-channel min/max remap."""

    def ac_channel(ch):
        lo = jnp.min(ch)
        hi = jnp.max(ch)
        scale = 255.0 / jnp.maximum(hi - lo, 1e-8)
        out = jnp.clip(jnp.round((ch - lo) * scale), 0.0, 255.0)
        return jnp.where(hi <= lo, ch, out)

    chans = [ac_channel(img[..., c]) for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


def cutout(img, pad_size, center_y, center_x, fill):
    """Zero/fill a (2*pad)² square clamped to the image (timm/DeVries cutout)."""
    H, W, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    mask = (
        (ys >= center_y - pad_size)
        & (ys < center_y + pad_size)
        & (xs >= center_x - pad_size)
        & (xs < center_x + pad_size)
    )
    return jnp.where(mask[..., None], fill, img)
