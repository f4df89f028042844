"""Pallas depthwise conv vs lax.conv reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.ops import pallas_dwconv as dw


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # Mosaic doesn't compile for CPU; run the kernel in interpreter mode.
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(dw.pl, "pallas_call", patched)


def test_forward_matches_lax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 10, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 8)), jnp.float32)
    out = dw.depthwise_conv7x7(x, w)
    ref = dw.dwconv7x7_reference(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 4)), jnp.float32)

    def loss_pallas(x, w):
        return jnp.sum(dw.depthwise_conv7x7(x, w) ** 2)

    def loss_ref(x, w):
        return jnp.sum(dw.dwconv7x7_reference(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_bf16_io_fp32_accum():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 8)), jnp.bfloat16)
    out = dw.depthwise_conv7x7(x, w)
    assert out.dtype == jnp.bfloat16
    ref = dw.dwconv7x7_reference(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.15
    )


def test_fits_vmem_gate():
    assert dw.fits_vmem(56, 56, 96, 2)       # ConvNeXt-T stage 0 bf16
    assert not dw.fits_vmem(800, 1216, 256, 4)  # detection-scale input
