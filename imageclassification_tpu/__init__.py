"""imageclassification_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-classification
training framework with the capabilities of the PyTorch reference
`abelxiaoxing/ImageClassification` (see SURVEY.md for the full layer map).

Design (TPU-first, not a port):
  * one jit-compiled train step fuses on-device augmentation (flips, color jitter,
    RandAugment, random erasing), mixup/cutmix, forward, loss, grad, optimizer,
    EMA and device-side per-class metrics (reference does ~10 host round trips per
    step, engine.py:40-97);
  * data parallelism via a `jax.sharding.Mesh` with NamedSharding-annotated jit —
    XLA inserts the gradient all-reduce over ICI (reference: DDP/NCCL,
    train.py:218-222), with optional FSDP-style parameter sharding;
  * flax.linen model zoo (ResNet / ConvNeXt / ViT / EfficientViT) replacing
    `timm.create_model` (reference train.py:194);
  * optax optimizer stack with injectable per-step LR/WD schedule values
    (reference mutates param_groups per step, engine.py:33-38).
"""

__version__ = "0.1.0"
