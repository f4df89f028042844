"""Downstream-task extension point (reference §2.2: the vendored
object_detection/ and semantic_segmentation/ ConvNeXt dirs).

The reference ships NON-RUNNABLE partial snapshots of facebookresearch/
ConvNeXt's mmdet/mmseg integration — config dicts + a registered backbone +
a layer-wise LR decay optimizer constructor that require external framework
checkouts (SURVEY §2.2: broken imports as-is). What they encode is capability
intent: (1) ConvNeXt as a multi-scale feature backbone, (2) per-size training
recipes for Mask R-CNN / Cascade Mask R-CNN / UPerNet, (3) layer-wise LR decay.

This package provides the TPU-native equivalents of those three:
  * backbone.py — pyramid feature extraction from any registry ConvNeXt
    (per-stage LayerNorms, out_indices — reference convnext.py:100-108) plus
    pretrained-classifier weight transfer with mismatch pruning;
  * configs.py — the full per-size recipe tables from the reference configs
    (depths/dims/drop_path/lr/layer-decay/schedule) as plain dataclasses a
    JAX detection/segmentation harness consumes;
  * layer-wise LR decay itself lives in optim/layer_decay.py and is shared
    with classification fine-tuning.
"""

from .backbone import ConvNeXtBackbone, load_backbone_from_classifier
from .configs import DETECTION_CONFIGS, SEGMENTATION_CONFIGS
