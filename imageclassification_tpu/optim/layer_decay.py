"""Layer-wise LR decay (reference D3: mmcv_custom/layer_decay_optimizer_
constructor.py — stem=0, blocks map to layers, head gets the highest id;
per-group lr_scale = decay_rate^(num_layers - layer_id - 1), :98).

Instead of param groups, we produce a per-leaf scalar pytree consumed by the
optimizer chain (factory._scale_by_leaf) — the scaling happens inside the jit
step at zero extra cost. Layer ids are derived from flax param paths for the
local model families (ConvNeXt stages, ViT blocks, ResNet stages, EfficientViT
stages); unknown paths get the head id (scale 1.0).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp


def _path_str(path) -> str:
    parts = []
    for p in path:
        for attr in ("key", "idx", "name"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
    return "/".join(parts)


def _vit_layer_id(path: str, depth: int) -> int:
    if path.startswith(("patch_embed", "cls_token", "pos_embed")):
        return 0
    m = re.match(r"block(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return depth + 1  # head / final norm


def _generic_layer_id(path: str) -> int:
    m = re.search(r"stage(\d+)_block(\d+)", path)
    if m:
        return int(m.group(1)) * 4 + int(m.group(2)) + 1
    if path.startswith(("stem", "conv_stem", "bn_stem", "patch_embed")):
        return 0
    return 100  # head-ish → scale 1.0


def layer_decay_scales(params, model_name: str, decay_rate: float) -> Any:
    """Per-leaf LR scale pytree: decay_rate^(num_layers - layer_id - 1)."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    ids = []
    if model_name.startswith("convnext"):
        num_layers = 14  # 12 block slots + stem offset + head
        for path, _ in paths:
            p = _path_str(path)
            if p.startswith("stem"):
                ids.append(0)
            elif (m := re.match(r"stage(\d+)_block(\d+)", p)):
                stage, block = int(m.group(1)), int(m.group(2))
                layer = [1, 2, 3, 12][stage]
                if stage == 2:
                    layer = 3 + block // 3
                ids.append(layer)
            elif (m := re.match(r"downsample_(?:norm|conv)(\d+)", p)):
                ids.append([0, 2, 3, 12][int(m.group(1))])
            else:
                ids.append(num_layers - 1)
    elif model_name.startswith("vit"):
        depth = 1 + max(
            [int(m.group(1)) for path, _ in paths
             if (m := re.match(r"block(\d+)", _path_str(path)))] or [0]
        )
        num_layers = depth + 2
        for path, _ in paths:
            ids.append(_vit_layer_id(_path_str(path), depth))
    else:
        num_layers = 2 + max(_generic_layer_id(_path_str(p)) for p, _ in paths
                             if _generic_layer_id(_path_str(p)) < 100)
        for path, _ in paths:
            i = _generic_layer_id(_path_str(path))
            ids.append(min(i, num_layers - 1))

    scales = [
        jnp.asarray(decay_rate ** (num_layers - i - 1), jnp.float32) for i in ids
    ]
    return jax.tree_util.tree_unflatten(treedef, scales)
