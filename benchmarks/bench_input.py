"""Input-pipeline benchmark: host JPEG decode (native C++ vs PIL) and
host→device transfer throughput.

The training step is chip-bound (BREAKDOWN.md); this measures the OTHER side
of the pipeline on the current host so the end-to-end feeding capability is
on record. This bench container exposes a single CPU core — the per-core
decode rate is the meaningful number (TPU-VM hosts have 200+ vCPUs and the
DeviceLoader thread pool scales decode linearly until PCIe).

Writes benchmarks/input_bench.json.  Run: python benchmarks/bench_input.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_jpegs(root: Path, n=64, size=640):
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = root / f"{i}.jpg"
        if not p.exists():
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))
    return paths


def main():
    from imageclassification_tpu.data import native_decode as nd
    from imageclassification_tpu.data.loader import decode_image

    paths = make_jpegs(Path("/tmp/input_bench_jpegs"))
    out_size = 224
    results = {"host_cores": os.cpu_count()}

    # native C++ decoder (libjpeg DCT prescale + PIL-exact resample)
    if nd.get_lib() is not None:
        blobs = [open(p, "rb").read() for p in paths]
        t0 = time.perf_counter()
        for data in blobs:
            nd.decode_crop_resize(data, (0, 0, -1, -1), out_size)
        dt = time.perf_counter() - t0
        results["native_decode_ms_per_img"] = round(dt / len(paths) * 1e3, 2)
        results["native_decode_img_per_s_per_core"] = round(len(paths) / dt, 1)

    # full loader decode path (RRC geometry + resize), PIL fallback included
    t0 = time.perf_counter()
    for i, p in enumerate(paths):
        decode_image(p, out_size, train=True, seed=i)
    dt = time.perf_counter() - t0
    results["loader_decode_ms_per_img"] = round(dt / len(paths) * 1e3, 2)
    results["loader_decode_img_per_s_per_core"] = round(len(paths) / dt, 1)

    # host→device transfer (uint8 NHWC — 4x smaller than f32 over the link)
    import jax

    batch = np.zeros((128, 224, 224, 3), np.uint8)
    d = jax.device_put(batch)  # warm
    np.asarray(d).sum()
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        batch[0, 0, 0, 0] = i  # defeat caching
        d = jax.device_put(batch)
        d.block_until_ready()
    dt = time.perf_counter() - t0
    mb = batch.nbytes / 1e6
    results["h2d_uint8_MB_per_s"] = round(mb * reps / dt, 1)
    results["h2d_images_per_s"] = round(128 * reps / dt, 1)

    print(json.dumps(results, indent=2))
    out = Path(__file__).parent / "input_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
