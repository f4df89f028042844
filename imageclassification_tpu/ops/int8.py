"""int8 quantized inference path (reference C19: modelchange.py:7-20,
`torch.quantization.quantize_dynamic` — the reference's quantized model RUNS
int8 Linear matmuls; weight-only storage is not parity).

TPU-native design
-----------------
* Weights stay int8 from checkpoint through the forward — no dequantize-on-
  load. The matmul is `lax.dot_general(int8_acts, int8_weights,
  preferred_element_type=int32)`, which XLA lowers to the MXU's native int8
  path (2x the bf16 MAC rate on v5e), followed by a per-output-channel
  rescale fused into the consumer.
* Activations are quantized dynamically per tensor (symmetric absmax ->
  int8), the TPU-simple analogue of torch's dynamic quint8 (which uses an
  asymmetric zero-point; symmetric costs ~1 bit on skewed activations but
  needs no zero-point correction term in the matmul).
* Wiring is a flax method interceptor (`nn.intercept_methods`): any
  `nn.Dense` / `nn.DenseGeneral` whose kernel arrives as int8 is rerouted to
  the quantized matmul, with scales looked up by the module's param path.
  No model rewrite — the same model definition serves fp32, bf16 and int8.

Scope (parity with `quantize_dynamic(model, {nn.Linear})`): Dense-style
matmuls. Convolution kernels in an int8 checkpoint are dequantized at load
(weight-only storage, as before) — the reference quantizes only nn.Linear,
so e.g. ResNet/EfficientViT (conv-dominated) see little int8 compute under
BOTH frameworks, while ViT/ConvNeXt (Dense-dominated) run the real int8 path.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def dynamic_quantize_act(x, clip: float = 127.0):
    """Symmetric per-tensor dynamic activation quantization: returns
    (int8 values, fp32 scale)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(absmax, 1e-12) / clip
    q = jnp.clip(jnp.round(xf / scale), -clip, clip).astype(jnp.int8)
    return q, scale


def int8_matmul(x, w_int8, w_scale, bias=None, out_dtype=jnp.float32):
    """Dynamic-activation int8 matmul over the LAST axis of x.

    x: (..., K) float; w_int8: (K, N) int8; w_scale: (N,) fp32 per-output-
    channel scales. Accumulates int32 on the MXU, rescales by
    act_scale * w_scale, adds fp32 bias."""
    xq, a_scale = dynamic_quantize_act(x)
    acc = jax.lax.dot_general(
        xq, w_int8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _dense_general_int8(mod: nn.DenseGeneral, x, kernel, scale):
    """int8 path for DenseGeneral restricted to the trailing-axis contraction
    shape MultiHeadDotProductAttention uses (axis=-1 or (-2,-1), no
    batch_dims): collapse contract/output dims to a 2-D matmul."""
    axis = mod.axis if isinstance(mod.axis, (tuple, list)) else (mod.axis,)
    n_c = len(axis)
    # supported: the contracted axes are exactly the trailing axes of x
    assert tuple(axis) == tuple(range(-n_c, 0)), (
        f"int8 DenseGeneral supports trailing-axis contraction only, got {axis}"
    )
    assert not mod.batch_dims, "int8 DenseGeneral does not support batch_dims"
    contract_shape = kernel.shape[:n_c]
    out_shape = kernel.shape[n_c:]
    k = math.prod(contract_shape)
    n = math.prod(out_shape)
    x2 = x.reshape(x.shape[: x.ndim - n_c] + (k,))
    w2 = kernel.reshape(k, n)
    # stored scales cover the kernel's LAST dim; broadcast over the rest of
    # the output dims and flatten to per-column scales of the collapsed matmul
    s_full = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), out_shape
    ).reshape(n)
    bias = None
    if mod.use_bias:
        bias = mod.variables["params"]["bias"].reshape(n)
    y = int8_matmul(x2, w2, s_full, bias, out_dtype=mod.dtype or jnp.float32)
    return y.reshape(x.shape[: x.ndim - n_c] + tuple(out_shape))


def make_int8_interceptor(qscales: Dict[str, Any]):
    """Flax interceptor rerouting quantized Dense/DenseGeneral matmuls.

    `qscales` maps flat param keys ('block0/mlp/fc1/kernel') to per-channel
    scale vectors. A module is rerouted iff its kernel path is in `qscales`
    AND the kernel actually arrived int8 (so fp32 EMA weights under a
    quantized checkpoint are naturally exempt)."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or not isinstance(
            mod, (nn.Dense, nn.DenseGeneral)
        ):
            return next_fun(*args, **kwargs)
        key = "/".join(mod.path) + "/kernel" if mod.path else "kernel"
        scale = qscales.get(key)
        if scale is None:
            return next_fun(*args, **kwargs)
        kernel = mod.variables["params"]["kernel"]
        if kernel.dtype != jnp.int8:
            return next_fun(*args, **kwargs)
        x = args[0]
        if isinstance(mod, nn.DenseGeneral):
            return _dense_general_int8(mod, x, kernel, scale)
        bias = mod.variables["params"]["bias"] if mod.use_bias else None
        return int8_matmul(
            x, kernel, jnp.asarray(scale, jnp.float32), bias,
            out_dtype=mod.dtype or jnp.float32,
        )

    return interceptor


def quantized_apply(model, variables, *args, qscales, **kwargs):
    """model.apply with int8 Dense/DenseGeneral execution."""
    with nn.intercept_methods(make_int8_interceptor(qscales)):
        return model.apply(variables, *args, **kwargs)


# ---------------------------------------------------------------------------
# checkpoint-side helpers
# ---------------------------------------------------------------------------

def _is_executable_int8_key(key: str, arr) -> bool:
    """Kernels the interceptor can execute int8: Dense (2-D) and DenseGeneral
    (3-D — attention q/k/v/out projections). 4-D conv kernels are NOT
    executable here (reference parity: quantize_dynamic covers nn.Linear
    only) and get dequantized at load."""
    return key.endswith("kernel") and arr.ndim in (2, 3)


def split_executable_quant(ck: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Prepare a checkpoint loaded with dequantize=False for int8 execution.

    In place: dequantizes every quantized kernel the int8 runtime cannot
    execute (conv kernels), KEEPS executable kernels int8. Returns
    {flat_key: scales} for the retained kernels ({} for an unquantized
    checkpoint). The checkpoint's quant metadata is consumed (popped) so a
    re-pickle cannot double-dequantize later."""
    scales = ck.pop("quant_scales", None)
    dtype = ck.pop("quant_dtype", None)
    if not scales or dtype != "int8" or not isinstance(ck.get("model"), dict):
        return {}
    model = dict(ck["model"])
    active: Dict[str, np.ndarray] = {}
    n_deq = 0
    for k, s in scales.items():
        if k not in model:
            continue
        arr = np.asarray(model[k])
        if _is_executable_int8_key(k, arr):
            active[k] = np.asarray(s, np.float32)
        else:
            model[k] = (
                arr.astype(np.float32).reshape(-1, arr.shape[-1])
                * np.asarray(s, np.float32)
            ).reshape(arr.shape).astype(np.float32)
            n_deq += 1
    ck["model"] = model
    print(
        f"int8 execution: {len(active)} Dense kernels stay int8, "
        f"{n_deq} conv kernels dequantized (weight-only)"
    )
    return active
