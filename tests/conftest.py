"""Test config: force an 8-device virtual CPU mesh so the DP/FSDP sharding path
is exercised without TPU hardware (SURVEY §4 point 3). Must run before jax import."""

import os

# Force-override: the host sitecustomize registers the tunneled-TPU ('axon')
# PJRT plugin at interpreter start, so the env var alone is NOT enough — the
# jax.config update below is what actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture(scope="session")
def toy_dataset(tmp_path_factory):
    """A tiny 3-class folder dataset with deterministic solid-color images."""
    root = tmp_path_factory.mktemp("toy_ds")
    rng = np.random.default_rng(0)
    counts = {"cat": 12, "dog": 10, "fox": 8}
    for cls, n in counts.items():
        d = root / cls
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 255, size=(40 + i, 36 + i, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{cls}_{i}.jpg")
    return str(root)


@pytest.fixture(scope="session")
def toy_split_dataset(tmp_path_factory):
    """Manual train/ + val/ layout (train_split_rato=0 mode)."""
    root = tmp_path_factory.mktemp("toy_manual")
    rng = np.random.default_rng(1)
    for split, n in (("train", 8), ("val", 4)):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)
