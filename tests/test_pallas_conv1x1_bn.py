"""Golden tests for the fused 1x1-conv + BN-stats Pallas kernel
(ops/pallas_conv1x1_bn.py) — interpreter mode on CPU; the on-chip benchmark
is benchmarks/bench_conv1x1_bn.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.ops.pallas_conv1x1_bn import (
    conv1x1_bn_stats,
    xla_reference,
)


@pytest.mark.parametrize("m,k,n", [(512, 128, 256), (1024, 256, 128)])
def test_matmul_and_stats_match_xla(m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.float32)
    y, stats = conv1x1_bn_stats(x, w, interpret=True)
    y_ref, stats_ref = xla_reference(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=2e-5, atol=1e-3
    )
    # stats really are BN batch statistics of y
    mean = np.asarray(stats)[0] / m
    var = np.asarray(stats)[1] / m - mean**2
    np.testing.assert_allclose(mean, np.asarray(y_ref, np.float32).mean(0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(var, np.asarray(y_ref, np.float32).var(0),
                               rtol=1e-3, atol=1e-4)


def test_fused_input_bn_relu():
    """The prologue variant normalizes the input with the previous layer's
    folded BN (+ReLU) before the matmul."""
    rng = np.random.default_rng(1)
    m, k, n = 512, 128, 128
    x = jnp.asarray(rng.normal(0, 2, (m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (k,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.3, (k,)), jnp.float32)

    y, stats = conv1x1_bn_stats(x, w, scale, shift, relu_in=True,
                                interpret=True)
    y_ref, stats_ref = xla_reference(x, w, scale, shift, relu_in=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-4, atol=1e-2)

    # without relu
    y2, _ = conv1x1_bn_stats(x, w, scale, shift, relu_in=False,
                             interpret=True)
    y2_ref, _ = xla_reference(x, w, scale, shift, relu_in=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_inputs():
    """bf16 in / bf16 out with fp32 stats — the model-path dtype regime."""
    rng = np.random.default_rng(2)
    m, k, n = 1024, 256, 128
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.bfloat16)
    y, stats = conv1x1_bn_stats(x, w, interpret=True)
    assert y.dtype == jnp.bfloat16
    assert stats.dtype == jnp.float32
    y_ref, stats_ref = xla_reference(x, w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=2e-2, atol=2.0
    )
