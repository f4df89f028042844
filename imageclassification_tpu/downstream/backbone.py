"""ConvNeXt multi-scale backbone adapter (reference D1/D2:
object_detection/mmdet/models/backbones/convnext.py — byte-identical copy in
semantic_segmentation/backbone/convnext.py).

The reference registers an mmdet/mmseg BACKBONE returning per-stage,
per-stage-LayerNormed feature maps selected by `out_indices`
(convnext.py:100-108,140-150). Here the classification model itself exposes
that view (`features_only=True` on models.convnext.ConvNeXt), and this adapter
adds the two downstream-specific pieces: strides/channels metadata for FPN
consumers and weight transfer from a classification checkpoint (the
`init_cfg`/load_checkpoint path at convnext.py:110-138) with the framework's
name+shape mismatch pruning.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..checkpoint.io import load_checkpoint, load_params_with_pruning
from ..models import create_model


class ConvNeXtBackbone:
    """Functional pyramid-feature extractor around a registry model with
    `features_only` (ConvNeXt — the reference's downstream backbone — or
    Swin, beyond reference: both expose per-stage-normed NHWC maps at
    strides 4/8/16/32)."""

    def __init__(
        self,
        variant: str = "convnext_tiny",
        out_indices: Tuple[int, ...] = (0, 1, 2, 3),
        drop_path_rate: float = 0.0,
        half_precision: bool = True,
    ):
        self.variant = variant
        self.out_indices = tuple(out_indices)
        self.model = create_model(
            variant,
            num_classes=0,
            features_only=True,
            out_indices=self.out_indices,
            drop_path_rate=drop_path_rate,
            half_precision=half_precision,
        )

    @property
    def feature_strides(self) -> Sequence[int]:
        return [4 * 2**i for i in self.out_indices]

    @property
    def feature_channels(self) -> Sequence[int]:
        if hasattr(self.model, "dims"):         # ConvNeXt-style dim table
            dims = list(self.model.dims)
        else:                                   # Swin: embed_dim * 2^stage
            n = len(self.model.depths)
            dims = [self.model.embed_dim * 2 ** i for i in range(n)]
        return [dims[i] for i in self.out_indices]

    def init(self, rng, input_shape=(1, 224, 224, 3)):
        return self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            jnp.zeros(input_shape, jnp.float32),
            train=False,
        )

    def apply(self, variables, x, train: bool = False, rngs=None):
        """Returns a list of NHWC feature maps at strides 4/8/16/32."""
        return self.model.apply(variables, x, train=train, rngs=rngs)


def load_backbone_from_classifier(backbone: ConvNeXtBackbone, ckpt_path: str, rng=None):
    """Initialize backbone params from a classification checkpoint, pruning
    the classifier head and anything mismatched (reference pretrained path,
    convnext.py:129-137 + utils.py:584-595 semantics)."""
    rng = rng if rng is not None else jax.random.key(0)
    variables = backbone.init(rng)
    ck = load_checkpoint(ckpt_path)
    params, missing = load_params_with_pruning(variables["params"], ck["model"])
    print(f"backbone transfer: {missing} classifier-only keys skipped")
    return {**variables, "params": params}
