"""Fixed-seed golden metrics (SURVEY §4 point 4): a deterministic 2-epoch CLI
run must reproduce the recorded loss/accuracy trajectory. The input pipeline
is bit-reproducible by design (host decode randomness is a pure function of
(seed, sample); device aug keys fold the step index), so drift here means a
semantic change to the training path, not noise."""

import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "train_metrics.json"


@pytest.mark.slow
def test_fixed_seed_training_matches_golden(toy_dataset, tmp_path):
    import train as train_cli
    from imageclassification_tpu.config import TrainConfig

    cfg = TrainConfig(
        data_path=toy_dataset, train_split_rato=0.85,
        output_dir=str(tmp_path / "out"), log_dir=str(tmp_path / "log"),
        model="resnet18", input_size=32, batch_size=8, epochs=2,
        warmup_epochs=0, seed=0, num_workers=2, device="cpu",
        pretrained=False, auto_resume=False, half_precision=False,
        mixup=0.2, smoothing=0.1, reprob=0.25, aa="rand-m9-mstd0.5-inc1",
    )
    train_cli.main(cfg)
    lines = [json.loads(l) for l in open(tmp_path / "log.txt")]
    got = [
        {"train_loss": l["train_loss"], "test_acc1": l["test_acc1"],
         "test_loss": l["test_loss"]}
        for l in lines
    ]

    if not GOLDEN.exists():  # first run records the golden file
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=2))
        pytest.skip("golden file recorded; rerun to compare")

    ref = json.loads(GOLDEN.read_text())
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        for k in ("train_loss", "test_loss"):
            np.testing.assert_allclose(g[k], r[k], rtol=5e-3, err_msg=k)
        assert g["test_acc1"] == pytest.approx(r["test_acc1"], abs=1e-6)
