"""Measure the ViT attention layout-copy band (HLO census: ~155 copies of
the bf16[128,197,12,64] head-split tensors per step ≈ 6 GB/step of pure
layout traffic, 12% of the vit_base step in trace_ops_vit_base_patch16).

Hypothesis: flax MultiHeadDotProductAttention keeps activations logically
[B,N,H,D]; its attention einsums ('bqhd,bkhd->bhqk') need (b,h) batch dims,
so XLA layout-assigns transposes around every dot, forward AND backward.
Projecting q/k/v straight into [B,H,N,D] and keeping every attention tensor
in that order gives the dots canonical batched-matmul operands.

Run on chip: python benchmarks/bench_attn_layout.py
Writes benchmarks/attn_layout_bench.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    out = {}
    for impl in ("flax", "bhnd"):
        os.environ["VIT_ATTN_IMPL"] = impl
        step_fn, fresh_state, data = bench._build(
            128, model_name="vit_base_patch16"
        )
        per = bench.time_scan(step_fn, fresh_state, data)
        out[impl] = {
            "ms_per_step": round(per * 1e3, 2),
            "images_per_sec": round(128 / per, 1),
        }
        print(impl, out[impl], flush=True)
    os.environ.pop("VIT_ATTN_IMPL", None)
    path = os.path.join("benchmarks", "attn_layout_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
