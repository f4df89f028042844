"""Host-side decode + double-buffered device feed (replaces the reference's
DataLoader workers, train.py:152-170).

Split of work (SURVEY §7 layer 2): the host does only what needs the original
variable-size image — JPEG decode and the geometric crop+resize to a fixed
canvas — emitting uint8 NHWC. Everything pixel-valued (flips, color jitter,
RandAugment, normalize, random erasing, mixup) runs on-device inside the jit
step. uint8 transfer is 4× cheaper over PCIe/ICI than f32 and the static canvas
keeps the step compile-once.

Geometry parity with the reference train transform (datasets.py:124-136, timm
create_transform): RandomResizedCrop with scale=(1,1), ratio=(1,1) and bicubic
interpolation — which for non-square images degenerates to a largest-center-crop
+ resize (timm's 10-try sampler can never fit sqrt(H*W) inside min(H,W)).
Eval: squash Resize([s, s]) with bilinear + NO center crop (datasets.py:139-144).

The loader overlaps three stages: thread-pool decode of batch k+2, host→device
transfer of batch k+1, and device compute of batch k.
"""

from __future__ import annotations

import math
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
from PIL import Image

from ..parallel.mesh import make_global_batch

def _rng(seed: int) -> np.random.Generator:
    """Per-sample deterministic generator: the reference's DataLoader workers
    draw from per-worker torch RNG (not reproducible across worker counts);
    here crop geometry is a pure function of (seed, sample), so runs are
    bit-reproducible regardless of thread scheduling."""
    return np.random.default_rng(seed)


def _rrc_params(w, h, scale, ratio, rng):
    """timm/torchvision RandomResizedCrop parameter sampling (10 tries + fallback)."""
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = rng.uniform(scale[0], scale[1]) * area
        ar = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        tw = int(round(math.sqrt(target_area * ar)))
        th = int(round(math.sqrt(target_area / ar)))
        if 0 < tw <= w and 0 < th <= h:
            i = int(rng.integers(0, h - th + 1))
            j = int(rng.integers(0, w - tw + 1))
            return i, j, th, tw
    in_ratio = w / h
    if in_ratio < min(ratio):
        tw = w
        th = int(round(tw / min(ratio)))
    elif in_ratio > max(ratio):
        th = h
        tw = int(round(th * max(ratio)))
    else:
        tw, th = w, h
    return (h - th) // 2, (w - tw) // 2, th, tw


def decode_image(
    path: str,
    size: int,
    train: bool,
    seed: int = 0,
    scale=(1.0, 1.0),
    ratio=(1.0, 1.0),
) -> np.ndarray:
    """Decode one image to a uint8 [size, size, 3] canvas.

    train=True: RandomResizedCrop geometry + bicubic (reference train path).
    train=False: squash resize + bilinear (reference eval path, datasets.py:141).

    JPEGs route through the native C++ decoder (GIL-free libjpeg + PIL-exact
    separable resample, native/decode.cpp) when it built; everything else (and
    any native failure) uses PIL."""
    if path.lower().endswith((".jpg", ".jpeg")):
        out = _decode_native(path, size, train, seed, scale, ratio)
        if out is not None:
            return out
    with Image.open(path) as img:
        img = img.convert("RGB")
        if train:
            w, h = img.size
            i, j, th, tw = _rrc_params(w, h, scale, ratio, _rng(seed))
            img = img.resize((size, size), Image.BICUBIC, box=(j, i, j + tw, i + th))
        else:
            img = img.resize((size, size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


def _decode_native(path, size, train, seed, scale, ratio):
    from . import native_decode as nd

    if nd.get_lib() is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    dims = nd.jpeg_dims(data)
    if dims is None:
        return None
    w, h = dims
    if train:
        i, j, th, tw = _rrc_params(w, h, scale, ratio, _rng(seed))
        return nd.decode_crop_resize(data, (j, i, tw, th), size, nd.BICUBIC)
    return nd.decode_crop_resize(data, (0, 0, -1, -1), size, nd.BILINEAR)


class DeviceLoader:
    """Iterate `indices [steps, local_bs]` as sharded device batches.

    Yields dicts {'image': uint8 [B,H,W,3], 'label': int32 [B]} already placed on
    the mesh with the batch dim sharded over the data axis. Index -1 marks eval
    padding: the pixel slot is zero and the label is -1 (masked device-side).
    """

    def __init__(
        self,
        dataset,
        mesh,
        indices: np.ndarray,
        image_size: int,
        train: bool,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        scale=(1.0, 1.0),
        ratio=(1.0, 1.0),
    ):
        self.dataset = dataset
        self.mesh = mesh
        self.indices = indices
        self.image_size = image_size
        self.train = train
        self.seed = seed
        self.num_workers = max(1, min(num_workers, 64))
        self.prefetch = prefetch
        self.scale = tuple(scale)
        self.ratio = tuple(ratio)

    def __len__(self) -> int:
        return len(self.indices)

    def _decode_one(self, idx: int) -> tuple[np.ndarray, int]:
        if idx < 0:
            s = self.image_size
            return np.zeros((s, s, 3), dtype=np.uint8), -1
        path, label = self.dataset.samples[idx]
        # collision-free (seed, idx) mix: the previous `(seed<<20)^(idx+1)`
        # packing collided across adjacent epochs once idx exceeded 2^20
        # (ImageNet-scale), silently reusing crop geometry
        per_sample_seed = int(
            np.random.SeedSequence([self.seed, idx + 1]).generate_state(1)[0]
        )
        img = decode_image(
            path, self.image_size, self.train,
            per_sample_seed, self.scale, self.ratio,
        )
        return img, label

    def _host_batch(self, pool: ThreadPoolExecutor, step_indices: np.ndarray):
        results = list(pool.map(self._decode_one, step_indices.tolist()))
        images = np.stack([r[0] for r in results])
        labels = np.asarray([r[1] for r in results], dtype=np.int32)
        return {"image": images, "label": labels}

    def __iter__(self) -> Iterator[dict]:
        with ThreadPoolExecutor(self.num_workers) as pool:
            host_futures: deque = deque()
            # one orchestrator thread per prefetched batch — a single thread
            # would serialize _host_batch calls and cap the lookahead at one
            # batch regardless of `prefetch` (the per-sample decodes inside
            # still share the bounded `pool` above)
            io_pool = ThreadPoolExecutor(max(1, self.prefetch))
            try:
                steps = len(self.indices)
                for k in range(min(self.prefetch, steps)):
                    host_futures.append(
                        io_pool.submit(self._host_batch, pool, self.indices[k])
                    )
                next_submit = min(self.prefetch, steps)
                for k in range(steps):
                    host = host_futures.popleft().result()
                    if next_submit < steps:
                        host_futures.append(
                            io_pool.submit(self._host_batch, pool, self.indices[next_submit])
                        )
                        next_submit += 1
                    yield make_global_batch(self.mesh, host)
            finally:
                io_pool.shutdown(wait=False, cancel_futures=True)
