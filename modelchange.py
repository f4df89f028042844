"""Model lifecycle conversions (reference C19: modelchange.py) — TPU-native.

Mapping from the reference's CUDA-serving formats to TPU/portable ones
(SURVEY §2.3 export row):

  reference                         | here
  ----------------------------------+------------------------------------------
  convert_model_ema_to_model (:155) | same: promote EMA weights into `model`,
                                    | strip optimizer state
  dynamic_quantize_model (:7-20)    | int8 per-channel absmax quantization;
                                    | Dense kernels EXECUTE int8 at inference
                                    | (dynamic activation quant + int8 MXU
                                    | matmul, ops/int8.py — the analogue of
                                    | quantize_dynamic's int8 nn.Linear);
                                    | conv kernels are weight-only storage;
                                    | bf16/fp16 modes cast
  pth2jit  (torch.jit.trace, :23)   | pth2aot: AOT-lowered XLA executable via
                                    | jax.export (compile-ready StableHLO,
                                    | platform-tagged)
  pth2onnx (:37-65)                 | pth2stablehlo: serialized StableHLO
                                    | artifact (the portable interchange format
                                    | of the XLA ecosystem), verified by
                                    | round-trip deserialize + numeric check
                                    | (the onnx.checker equivalent)
  onnx2trt / pth2trt (:68-153)      | the same StableHLO artifact IS the
                                    | serving input for TPU (XLA consumes it
                                    | directly); `pth2trt` alias kept

Each function takes a checkpoint path produced by train.py (the checkpoint
stores its own model_spec + input_shape, so no architecture flags are needed —
same UX as the reference's pickled-module checkpoints).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from imageclassification_tpu.checkpoint.io import load_checkpoint
from val import initialize_model


def _derive_out(pth_path: str, suffix: str) -> str:
    """Output path from the input path — guaranteed DIFFERENT (a bare
    `path.replace('.pth', suffix)` on an extensionless file returns the
    input path unchanged and would overwrite the source checkpoint)."""
    out = (pth_path[: -len(".pth")] + suffix) if pth_path.endswith(".pth") \
        else pth_path + suffix
    assert out != pth_path
    return out


def _forward_fn(model, batch_stats, qscales=None):
    from imageclassification_tpu.ops.int8 import quantized_apply

    def fwd(params, x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if qscales:
            # int8 checkpoints export the QUANTIZED forward — the serialized
            # artifact runs int8 matmuls, like a TensorRT int8 engine
            return quantized_apply(model, variables, x, qscales=qscales,
                                   train=False)
        return model.apply(variables, x, train=False)

    return fwd


def convert_model_ema_to_model(pth_path: str, out_path: str | None = None) -> str:
    """Promote EMA weights into `model` and strip optimizer/step state
    (reference modelchange.py:155-162)."""
    ck = load_checkpoint(pth_path)
    if "model_ema" not in ck:
        raise KeyError(f"{pth_path} has no model_ema")
    ck["model"] = ck.pop("model_ema")
    if "model_ema_batch_stats" in ck:
        # BN statistics must follow the EMA weights they were averaged with
        # (the reference's state_dict-based conversion carries BN buffers)
        ck["batch_stats"] = ck.pop("model_ema_batch_stats")
    ck.pop("optimizer", None)
    ck.pop("step", None)
    out_path = out_path or _derive_out(pth_path, "-ema.pth")
    with open(out_path, "wb") as f:
        pickle.dump(ck, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {out_path}")
    return out_path


def dynamic_quantize_model(
    pth_path: str, dtype: str = "int8", out_path: str | None = None
) -> str:
    """Quantize matmul kernels (reference modelchange.py:7-20,
    torch.quantization.quantize_dynamic on nn.Linear).

    int8: per-output-channel absmax scaling on ndim>=2 kernels. At inference
    (val.py / StableHLO export) Dense/DenseGeneral kernels stay int8 and run
    real int8 matmuls with dynamic activation quantization (ops/int8.py —
    the reference's dynamic-int8 Linear execution); conv kernels are
    weight-only storage, dequantized at load (the reference quantizes only
    nn.Linear, so convs are fp32 there too). fp16/bf16: cast everything."""
    ck = load_checkpoint(pth_path)
    flat = ck["model"]
    qflat = {}
    scales = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if dtype in ("fp16", "float16"):
            qflat[k] = arr.astype(np.float16)
        elif dtype in ("bf16", "bfloat16"):
            qflat[k] = np.asarray(jnp.asarray(arr, jnp.bfloat16))
        elif dtype == "int8":
            if k.endswith("kernel") and arr.ndim >= 2 and arr.size > 4096:
                mat = arr.reshape(-1, arr.shape[-1])
                s = np.abs(mat).max(axis=0) / 127.0
                s = np.where(s == 0, 1.0, s)
                q = np.clip(np.round(mat / s), -127, 127).astype(np.int8)
                qflat[k] = q.reshape(arr.shape)
                scales[k] = s.astype(np.float32)
            else:
                qflat[k] = arr
        else:
            raise ValueError(f"unsupported quantization dtype {dtype}")
    ck["model"] = qflat
    ck["quant_scales"] = scales
    ck["quant_dtype"] = dtype
    out_path = out_path or _derive_out(pth_path, f"-{dtype}.pth")
    with open(out_path, "wb") as f:
        pickle.dump(ck, f, protocol=pickle.HIGHEST_PROTOCOL)
    n_q = len(scales)
    print(f"wrote {out_path} ({dtype}; {n_q} kernels quantized)")
    return out_path


def prune_model(
    pth_path: str,
    sparsity: float = 0.5,
    scope: str = "global",
    out_path: str | None = None,
) -> str:
    """Magnitude pruning (beyond reference: its README todo #5 '剪枝').

    Zeroes the smallest-magnitude weights of every matmul/conv kernel
    (ndim>=2, >4096 elements — the same eligibility as int8 quantization).
    scope='global' ranks magnitudes across all eligible kernels jointly
    (layers prune unevenly, standard for one-shot pruning); 'per_kernel'
    applies the ratio to each kernel independently. The pruned checkpoint is
    a normal checkpoint — fine-tune it by passing it to --pretrained_path or
    --resume. Records 'prune_sparsity' metadata and prints the achieved
    per-kernel sparsities."""
    if not 0.0 < sparsity < 1.0:
        raise ValueError(f"sparsity must be in (0,1), got {sparsity}")
    ck = load_checkpoint(pth_path)
    flat = ck["model"]
    eligible = {
        k: np.asarray(v, np.float32) for k, v in flat.items()
        if k.endswith("kernel") and np.ndim(v) >= 2 and np.size(v) > 4096
        and not k.endswith("head/kernel")  # never prune classifier Linears
        # (head, mobilenetv3 pre_head): their weights are small-magnitude vs
        # conv kernels, so a global threshold zeroes them outright and
        # --prune_mask would freeze the logits at bias-only
    }
    if not eligible:
        raise ValueError("no prunable kernels found")

    if scope == "global":
        all_mags = np.concatenate([np.abs(v).ravel() for v in eligible.values()])
        thresh = np.quantile(all_mags, sparsity)
        thresholds = {k: thresh for k in eligible}
    elif scope == "per_kernel":
        thresholds = {
            k: np.quantile(np.abs(v), sparsity) for k, v in eligible.items()
        }
    else:
        raise ValueError(f"unknown scope {scope!r}")

    pruned = dict(flat)
    total = kept = 0
    for k, v in eligible.items():
        mask = np.abs(v) > thresholds[k]
        pruned[k] = (v * mask).astype(np.asarray(flat[k]).dtype)
        total += mask.size
        kept += int(mask.sum())
        print(f"  {k}: {1.0 - mask.mean():.3f} sparse")
    ck["model"] = pruned
    ck["prune_sparsity"] = 1.0 - kept / total
    ck.pop("optimizer", None)  # stale optimizer moments would undo the zeros
    ck.pop("step", None)
    out_path = out_path or _derive_out(pth_path, f"-pruned{sparsity:g}.pth")
    with open(out_path, "wb") as f:
        pickle.dump(ck, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(
        f"wrote {out_path} (achieved sparsity "
        f"{ck['prune_sparsity']:.3f} over {len(eligible)} kernels)"
    )
    return out_path


def _export_model(pth_path: str, model_ema: bool, platforms=None):
    from jax import export as jexport

    model, params, batch_stats, ck = initialize_model(
        pth_path, model_ema, return_checkpoint=True
    )
    shape = tuple(ck.get("input_shape") or (1, 224, 224, 3))
    # qscales passed unconditionally: if --model_ema fell back to the raw
    # (still-int8) weights because the checkpoint has no EMA, the quantized
    # path MUST run — the interceptor's kernel.dtype==int8 check already
    # exempts genuine fp32 EMA params, so this is safe in both cases
    # (exporting plain model.apply over int8 kernels would silently bake
    # unscaled -127..127 weights into the artifact).
    qscales = ck.get("quant_exec_scales")
    fwd = _forward_fn(model, batch_stats, qscales)
    fn = jax.jit(lambda x: fwd(params, x))
    kwargs = {}
    if platforms:
        kwargs["platforms"] = platforms
    exp = jexport.export(fn, **kwargs)(
        jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    return exp, shape


def pth2stablehlo(
    pth_path: str, out_path: str | None = None, model_ema: bool = False
) -> str:
    """Export the inference function as a serialized StableHLO artifact with
    weights baked in; verify by round-trip deserialize + numeric comparison
    (the reference's onnx.checker step, modelchange.py:56-58)."""
    from jax import export as jexport

    exp, shape = _export_model(pth_path, model_ema, platforms=["cpu", "tpu"])
    data = exp.serialize()
    out_path = out_path or _derive_out(pth_path, ".stablehlo")
    with open(out_path, "wb") as f:
        f.write(data)

    # checker: reload and compare against the live model on zeros
    back = jexport.deserialize(data)
    x = jnp.zeros(shape, jnp.float32)
    ref = exp.call(x)
    got = back.call(x)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(got, np.float32), rtol=1e-5
    )
    print(f"wrote {out_path} ({len(data)} bytes, verified)")
    return out_path


def pth2aot(
    pth_path: str, out_path: str | None = None, model_ema: bool = False
) -> str:
    """AOT artifact for the CURRENT backend (torch.jit.trace analogue,
    reference modelchange.py:23-35): platform-tagged StableHLO that XLA
    consumes without retracing Python."""
    exp, _ = _export_model(pth_path, model_ema)
    out_path = out_path or _derive_out(pth_path, ".aot.stablehlo")
    with open(out_path, "wb") as f:
        f.write(exp.serialize())
    print(f"wrote {out_path} (platforms={exp.platforms})")
    return out_path


# serving alias: on TPU the serialized StableHLO plays the role the TensorRT
# engine plays on GPU (reference pth2trt, modelchange.py:146-153)
pth2trt = pth2stablehlo


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns an object with .call(x)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser("Checkpoint conversion")
    p.add_argument("--ckpt", default="train_cls/output/checkpoint-best.pth")
    p.add_argument(
        "--mode",
        default="stablehlo",
        choices=["ema2model", "quantize", "prune", "stablehlo", "aot"],
    )
    p.add_argument("--dtype", default="int8")
    p.add_argument("--sparsity", default=0.5, type=float)
    p.add_argument("--prune_scope", default="global",
                   choices=["global", "per_kernel"])
    p.add_argument("--model_ema", default=False, action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                   help="cpu pins the platform at the config level "
                        "(JAX_PLATFORMS env alone cannot once the TPU "
                        "plugin is registered)")
    a = p.parse_args()
    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if a.mode == "ema2model":
        convert_model_ema_to_model(a.ckpt, a.out)
    elif a.mode == "quantize":
        dynamic_quantize_model(a.ckpt, a.dtype, a.out)
    elif a.mode == "prune":
        prune_model(a.ckpt, a.sparsity, a.prune_scope, a.out)
    elif a.mode == "aot":
        pth2aot(a.ckpt, a.out, a.model_ema)
    else:
        pth2stablehlo(a.ckpt, a.out, a.model_ema)
