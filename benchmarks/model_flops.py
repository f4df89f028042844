"""Per-family forward FLOPs from XLA's own cost analysis (CPU backend).

Why this instrument exists: round-3 MFU claims for ViT-B and Swin-T used
published *GMAC* figures (17.6 / 4.5) as if they were GFLOPs, understating
MFU by exactly 2x under the 2-flops-per-MAC convention every other number
in this directory uses (bench.py's ResNet-50 roofline was derived from the
XLA-reported 1.05e12 flops at batch 128 = 8.2 G/img — the SAME convention
this file applies to every family). jax's compiled cost_analysis()["flops"]
is the receipt: backend-independent static FLOP count of the lowered HLO.

Run (CPU, no chip needed — pop PYTHONPATH so the axon sitecustomize cannot
override JAX_PLATFORMS):
    env -u PYTHONPATH JAX_PLATFORMS=cpu python benchmarks/model_flops.py

Writes benchmarks/model_flops.json: {model: {fwd_gflops_per_img, params_m}}.
MFU for a training row in bench_models.json is then
    img_s * (3 + metric_fwd) * fwd_gflops * 1e9 / 197e12
(fwd + dgrad + wgrad = 3x fwd FLOPs; exact parity mode adds the metric
forward — bench.py module docstring).

Reference anchor for the families: /root/reference/train.py:194 reaches all
of them through timm.create_model; timm's own #params/GMACs table is the
source of the 17.6/4.5 GMAC figures this corrects the use of.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = [
    ("resnet50", 224),
    ("wide_resnet50_2", 224),
    ("resnext50_32x4d", 224),
    ("convnext_tiny", 224),
    ("convnextv2_tiny", 224),
    ("vit_small_patch16", 224),
    ("vit_base_patch16", 224),
    ("efficientvit_m0", 224),
    ("efficientvit_m5", 224),
    ("mobilenet_v3_small", 224),
    ("mobilenet_v3_large", 224),
    ("efficientnet_b0", 224),
    ("efficientnet_b4", 224),
    ("swin_tiny", 224),
    ("densenet121", 224),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", (
        "run with: env -u PYTHONPATH JAX_PLATFORMS=cpu — the cost analysis "
        "must not claim the tunneled chip"
    )
    from imageclassification_tpu.models import create_model

    out = {}
    for name, size in MODELS:
        model = create_model(name, num_classes=1000)
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        p = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(model.init, jax.random.key(0), x),
        )
        cost = (
            jax.jit(lambda p, x, m=model: m.apply(p, x, train=False))
            .lower(p, x).compile().cost_analysis()
        )
        n_params = sum(
            int(v.size) for v in jax.tree.leaves(p["params"])
        )
        out[name] = {
            "input_size": size,
            "fwd_gflops_per_img": round(cost["flops"] / 1e9, 2),
            "params_m": round(n_params / 1e6, 2),
        }
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "model_flops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
