"""int8 quantized-inference benchmark (reference C19 execution parity:
torch.quantization.quantize_dynamic runs int8 nn.Linear matmuls at serve
time, /root/reference/modelchange.py:7-20).

Two modes, results merged into benchmarks/int8_bench.json:

  accuracy   — quantize a trained checkpoint, evaluate fp32 vs int8 on an
               image-folder dataset through val.py's predict path, report
               the top-1 delta (target: within ~0.5%).
               python benchmarks/bench_int8.py accuracy --ckpt <pth> --data <dir>

  throughput — serving img/s of the jitted eval forward, bf16 vs int8
               (dynamic activation quant + int8 MXU matmul), per model
               family. Scan-difference timing per BREAKDOWN.md rules.
               python benchmarks/bench_int8.py throughput [--models vit_base_patch16,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "int8_bench.json"
K_LO, K_HI = 8, 24


def _load_out():
    if OUT.exists():
        return json.loads(OUT.read_text())
    return {}


def _eval_folder(predict, params, batch_stats, data, img_size, batch=64):
    """Top-1 over an image-folder tree using val.py's batched predict."""
    import jax.numpy as jnp

    from imageclassification_tpu.data.folder import scan_folder
    from val import _batched

    index = scan_folder(data)
    paths = [p for p, _ in index.samples]
    labels = np.asarray([l for _, l in index.samples])
    correct = 0
    pos = 0
    for chunk, imgs in _batched(paths, img_size, batch):
        probs = np.asarray(predict(params, batch_stats, imgs))
        preds = probs.argmax(-1)[: len(chunk)]
        correct += int((preds == labels[pos : pos + len(chunk)]).sum())
        pos += len(chunk)
    return 100.0 * correct / len(paths)


def accuracy(args):
    from modelchange import dynamic_quantize_model
    from val import _predict_fn, initialize_model

    qck = dynamic_quantize_model(args.ckpt, "int8")

    model, p0, bs0, ck0 = initialize_model(
        args.ckpt, model_ema=False, return_checkpoint=True
    )
    img_size = (ck0.get("input_shape") or [1, 224, 224, 3])[1]
    top1_fp = _eval_folder(
        _predict_fn(model), p0, bs0, args.data, img_size
    )
    _, pq, bsq, ckq = initialize_model(
        qck, model_ema=False, return_checkpoint=True
    )
    qscales = ckq["quant_exec_scales"]
    top1_q = _eval_folder(
        _predict_fn(model, qscales), pq, bsq, args.data, img_size
    )
    row = {
        "ckpt": args.ckpt,
        "model": ck0["model_spec"]["name"],
        "dataset": args.data,
        "n_int8_kernels": len(qscales),
        "top1_fp32": round(top1_fp, 3),
        "top1_int8": round(top1_q, 3),
        "delta_pts": round(top1_q - top1_fp, 3),
    }
    print(json.dumps(row))
    out = _load_out()
    out.setdefault("accuracy", []).append(row)
    OUT.write_text(json.dumps(out, indent=2))


def _time_forward(fn, x, carry0, weights):
    """Scan-difference per-step seconds (cancels tunnel RTT; BREAKDOWN.md)."""
    import jax
    import jax.numpy as jnp

    # weights are passed as a jit ARGUMENT: closed-over weight constants blow
    # the tunnel's compile-request size cap on ViT-B (HTTP 413)
    times = {}
    for K in (K_LO, K_HI):
        def scanned(c, xx, wts, K=K):
            def body(cc, _):
                y = fn(wts, xx + (cc * 0).astype(xx.dtype))
                m = y.astype(jnp.float32).mean()
                return cc + m * 1e-7, m
            return jax.lax.scan(body, c, None, length=K)[1]

        f = jax.jit(scanned)
        np.asarray(f(carry0, x, weights))  # compile + fetch
        best = float("inf")
        for rep in range(3):
            c0 = carry0 + 1e-5 * (rep + 1)
            t0 = time.perf_counter()
            np.asarray(f(c0, x, weights))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO)


def throughput(args):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.ops.int8 import quantized_apply

    rows = _load_out().get("throughput", {})
    rng = np.random.default_rng(0)
    for name in args.models.split(","):
        model = create_model(name, num_classes=1000, half_precision=True)
        v = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 224, 224, 3), jnp.float32), train=False,
        )
        params = v["params"]
        bstats = v.get("batch_stats", {})

        # quantize Dense/DenseGeneral kernels in the live tree
        import jax.tree_util as jtu

        flatpaths = jtu.tree_flatten_with_path(params)[0]
        qscales = {}
        qflat = {}
        for path, leaf in flatpaths:
            key = "/".join(
                str(getattr(p, a))
                for p in path for a in ("key", "idx", "name") if hasattr(p, a)
            )
            arr = np.asarray(leaf, np.float32)
            if (key.endswith("kernel") and arr.ndim in (2, 3)
                    and arr.size > 4096):
                mat = arr.reshape(-1, arr.shape[-1])
                s = np.abs(mat).max(axis=0) / 127.0
                s = np.where(s == 0, 1.0, s)
                qflat[key] = np.clip(np.round(mat / s), -127, 127).astype(
                    np.int8).reshape(arr.shape)
                qscales[key] = s.astype(np.float32)
        paths, treedef = jtu.tree_flatten_with_path(params)
        qleaves = []
        for path, leaf in paths:
            key = "/".join(
                str(getattr(p, a))
                for p in path for a in ("key", "idx", "name") if hasattr(p, a)
            )
            qleaves.append(jnp.asarray(qflat[key]) if key in qflat else leaf)
        qparams = jtu.tree_unflatten(jtu.tree_structure(params), qleaves)

        x = jnp.asarray(
            rng.normal(0, 1, (args.batch, 224, 224, 3)), jnp.bfloat16
        )

        def fwd_bf16(wts, xx):
            vv = {"params": wts}
            if bstats:
                vv["batch_stats"] = bstats
            return model.apply(vv, xx, train=False)

        def fwd_int8(wts, xx):
            vv = {"params": wts}
            if bstats:
                vv["batch_stats"] = bstats
            return quantized_apply(model, vv, xx, qscales=qscales, train=False)

        t_bf16 = _time_forward(fwd_bf16, x, jnp.float32(0.0), params)
        t_int8 = _time_forward(fwd_int8, x, jnp.float32(0.0), qparams)
        rows[name] = {
            "batch": args.batch,
            "n_int8_kernels": len(qscales),
            "bf16_img_per_s": round(args.batch / t_bf16, 1),
            "int8_img_per_s": round(args.batch / t_int8, 1),
            "speedup": round(t_bf16 / t_int8, 3),
        }
        print(name, rows[name], flush=True)

    out = _load_out()
    out["throughput"] = rows
    OUT.write_text(json.dumps(out, indent=2))
    print(f"wrote {OUT}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["accuracy", "throughput"])
    p.add_argument("--ckpt", default="/tmp/digits_run/output/checkpoint-best.pth")
    p.add_argument("--data", default="/tmp/digits_ds")
    p.add_argument("--models", default="vit_base_patch16,convnext_tiny")
    p.add_argument("--batch", type=int, default=128)
    a = p.parse_args()
    if a.mode == "accuracy":
        accuracy(a)
    else:
        throughput(a)


if __name__ == "__main__":
    main()
