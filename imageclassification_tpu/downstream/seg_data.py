"""Host-side segmentation dataset: mmseg-style folder pairs + crop pipeline.

Layout (mmseg ADE20K convention, semantic_segmentation/README.md:24-41):

    root/images/training/*.jpg       root/annotations/training/*.png
    root/images/validation/*.jpg     root/annotations/validation/*.png

Masks are single-channel PNGs of class ids; 255 = ignore. The train pipeline
mirrors the reference recipe's pipeline (upernet_convnext_tiny_...ss.py
train_pipeline: Resize ratio_range (0.5, 2.0) → RandomCrop crop_size →
RandomFlip 0.5 → Pad with ignore-label on the mask). Eval squash-resizes the
whole image to crop_size (documented deviation: mmseg ss eval slides a
crop×crop window at full resolution — equivalent at crop-sized images, and
the val set here is resized anyway; PARITY.md 'segmentation').

Kept dependency-free (PIL + numpy): masks must resample NEAREST, images
BILINEAR — PIL does both exactly.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from PIL import Image

IGNORE = 255
_IMG_EXT = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def scan_pairs(root: str, split: str) -> List[Tuple[str, str]]:
    """[(image, mask)] for a split ('training' | 'validation'), matched by
    stem; raises on unmatched images so silent label drops can't happen."""
    img_dir = os.path.join(root, "images", split)
    ann_dir = os.path.join(root, "annotations", split)
    if not os.path.isdir(img_dir):
        raise FileNotFoundError(
            f"{img_dir} not found — expected mmseg layout "
            "images/{training,validation} + annotations/{training,validation}")
    anns = {}
    for f in os.listdir(ann_dir):
        stem, ext = os.path.splitext(f)
        if ext.lower() == ".png":
            anns[stem] = os.path.join(ann_dir, f)
    pairs = []
    for f in sorted(os.listdir(img_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() not in _IMG_EXT:
            continue
        if stem not in anns:
            raise FileNotFoundError(f"no annotation png for image {f}")
        pairs.append((os.path.join(img_dir, f), anns[stem]))
    if not pairs:
        raise FileNotFoundError(f"no images under {img_dir}")
    return pairs


def num_classes_from_masks(pairs, sample: int = 64) -> int:
    """max class id + 1 over (a sample of) the masks, ignoring 255 — the
    segmentation analogue of the classifier's folder-count auto-num_classes."""
    hi = 0
    for _, ann in pairs[:sample]:
        a = np.asarray(Image.open(ann))
        a = a[a != IGNORE]
        if a.size:
            hi = max(hi, int(a.max()))
    return hi + 1


def _load(img_path: str, ann_path: str):
    img = Image.open(img_path).convert("RGB")
    ann = Image.open(ann_path)
    if ann.mode not in ("L", "P", "I"):
        ann = ann.convert("L")
    return img, ann


def train_sample(img_path: str, ann_path: str, crop: int,
                 rng: np.random.Generator):
    """One augmented training crop: ratio resize U(0.5, 2.0) → pad (img 0,
    mask IGNORE) → random crop → hflip 0.5. Returns (u8 HWC, int32 HW)."""
    img, ann = _load(img_path, ann_path)
    ratio = rng.uniform(0.5, 2.0)
    w = max(1, int(round(img.width * ratio)))
    h = max(1, int(round(img.height * ratio)))
    img = img.resize((w, h), Image.BILINEAR)
    ann = ann.resize((w, h), Image.NEAREST)
    x = np.asarray(img, np.uint8)
    y = np.asarray(ann).astype(np.int32)
    if h < crop or w < crop:
        px, py = max(0, crop - w), max(0, crop - h)
        x = np.pad(x, ((0, py), (0, px), (0, 0)))
        y = np.pad(y, ((0, py), (0, px)), constant_values=IGNORE)
        h, w = x.shape[:2]
    r0 = rng.integers(0, h - crop + 1)
    c0 = rng.integers(0, w - crop + 1)
    x = x[r0:r0 + crop, c0:c0 + crop]
    y = y[r0:r0 + crop, c0:c0 + crop]
    if rng.random() < 0.5:
        x, y = x[:, ::-1], y[:, ::-1]
    return np.ascontiguousarray(x), np.ascontiguousarray(y)


def val_sample(img_path: str, ann_path: str, size: int):
    """Squash-resize image+mask to size² (see module docstring)."""
    img, ann = _load(img_path, ann_path)
    img = img.resize((size, size), Image.BILINEAR)
    ann = ann.resize((size, size), Image.NEAREST)
    return (np.asarray(img, np.uint8),
            np.asarray(ann).astype(np.int32))


def train_batches(pairs, crop: int, batch: int, iters: int, seed: int = 0,
                  start: int = 0):
    """Yields (iteration, images, labels) for iterations [start, iters).
    Each iteration derives its own generator from (seed, iteration), so a
    resumed run sees exactly the batches the original would have — no RNG
    stream to fast-forward (the classification loader's counter-based
    randomness rule, SURVEY §7)."""
    n = len(pairs)
    for it in range(start, iters):
        rng = np.random.default_rng([seed, it])
        idx = rng.integers(0, n, batch)
        xs, ys = zip(*(train_sample(*pairs[i], crop, rng) for i in idx))
        yield it, np.stack(xs), np.stack(ys)


def val_batches(pairs, size: int, batch: int):
    for i in range(0, len(pairs), batch):
        chunk = pairs[i:i + batch]
        xs, ys = zip(*(val_sample(p, a, size) for p, a in chunk))
        yield np.stack(xs), np.stack(ys)
