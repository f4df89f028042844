"""Native C++ decoder vs PIL golden comparison + throughput sanity."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from imageclassification_tpu.data import native_decode as nd
from imageclassification_tpu.data.loader import decode_image


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("jp") / "test.jpg"
    rng = np.random.default_rng(5)
    # smooth-ish image (JPEG-friendly) so decode differences stay tiny
    base = rng.normal(128, 20, (300, 400, 3)).astype(np.float32)
    img = base
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(p, quality=95)
    return str(p)


def test_native_lib_builds():
    assert nd.get_lib() is not None, "native decoder failed to build"


def test_dims_match_pil(jpeg_file):
    data = open(jpeg_file, "rb").read()
    assert nd.jpeg_dims(data) == Image.open(jpeg_file).size


def test_eval_resize_close_to_pil(jpeg_file):
    data = open(jpeg_file, "rb").read()
    out = nd.decode_crop_resize(data, (0, 0, -1, -1), 64, nd.BILINEAR)
    ref = np.asarray(
        Image.open(jpeg_file).convert("RGB").resize((64, 64), Image.BILINEAR)
    )
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert np.mean(diff <= 2) > 0.98, f"mean |diff|={diff.mean():.2f}"


def test_crop_resize_close_to_pil(jpeg_file):
    data = open(jpeg_file, "rb").read()
    out = nd.decode_crop_resize(data, (50, 40, 200, 180), 64, nd.BICUBIC)
    ref = np.asarray(
        Image.open(jpeg_file).convert("RGB").resize(
            (64, 64), Image.BICUBIC, box=(50, 40, 250, 220))
    )
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert np.mean(diff <= 3) > 0.95, f"mean |diff|={diff.mean():.2f}"


def test_decode_image_uses_native_for_jpeg(jpeg_file):
    out = decode_image(jpeg_file, 32, train=False)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
