"""Downstream extension point (reference D1-D7 capability intent)."""

import jax
import jax.numpy as jnp
import pytest

from imageclassification_tpu.downstream import (
    DETECTION_CONFIGS,
    SEGMENTATION_CONFIGS,
    ConvNeXtBackbone,
)


def test_backbone_pyramid_shapes():
    bb = ConvNeXtBackbone("convnext_atto", half_precision=False)
    assert bb.feature_strides == [4, 8, 16, 32]
    assert bb.feature_channels == [40, 80, 160, 320]
    v = bb.init(jax.random.key(0), (1, 64, 64, 3))
    feats = bb.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert [f.shape for f in feats] == [
        (2, 16, 16, 40), (2, 8, 8, 80), (2, 4, 4, 160), (2, 2, 2, 320)
    ]


def test_backbone_out_indices_subset():
    bb = ConvNeXtBackbone("convnext_atto", out_indices=(1, 3), half_precision=False)
    v = bb.init(jax.random.key(0), (1, 32, 32, 3))
    feats = bb.apply(v, jnp.zeros((1, 32, 32, 3)))
    assert len(feats) == 2
    assert bb.feature_strides == [8, 32]


def test_backbone_transfer_from_classifier(tmp_path, toy_dataset):
    import train as train_cli
    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.downstream import load_backbone_from_classifier

    cfg = TrainConfig(
        data_path=toy_dataset, train_split_rato=0.5,
        output_dir=str(tmp_path / "o"), log_dir=str(tmp_path / "l"),
        model="convnext_atto", pretrained=False, batch_size=8, epochs=1,
        warmup_epochs=0, input_size=32, num_workers=2, mixup=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, device="cpu",
        half_precision=False,
    )
    train_cli.main(cfg)
    bb = ConvNeXtBackbone("convnext_atto", half_precision=False)
    variables = load_backbone_from_classifier(
        bb, str(tmp_path / "o" / "checkpoint-0.pth")
    )
    feats = bb.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert len(feats) == 4


def test_config_tables_complete():
    # reference publishes 7 detection rows and 6 segmentation rows
    assert len(DETECTION_CONFIGS) == 7
    assert len(SEGMENTATION_CONFIGS) == 6
    t = DETECTION_CONFIGS["cascade_mask_rcnn_convnext_tiny_3x"]
    assert t.epochs == 36 and t.layer_decay_rate == 0.7
    s = SEGMENTATION_CONFIGS["upernet_convnext_tiny_512_160k"]
    assert s.total_iters == 160_000 and s.crop_size == 512 and s.lr == 1e-4
