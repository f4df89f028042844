"""Integration: tiny end-to-end training runs through the real CLI main()
(SURVEY §4 point 2 — assert loss decreases, class_indices.json and
checkpoint-* artifacts appear, auto-resume continues at epoch+1)."""

import json
import os

import numpy as np
import pytest

from imageclassification_tpu.config import TrainConfig


def _base_cfg(toy_dataset, tmp_path, **kw):
    defaults = dict(
        data_path=toy_dataset,
        train_split_rato=0.5,
        output_dir=str(tmp_path / "output"),
        log_dir=str(tmp_path / "log_dir"),
        model="resnet18",
        pretrained=False,
        batch_size=8,
        epochs=2,
        warmup_epochs=0,
        input_size=32,
        num_workers=2,
        mixup=0.0,
        cutmix=0.0,
        smoothing=0.0,
        reprob=0.0,
        color_jitter=0.0,
        model_ema=False,
        save_ckpt=True,
        device="cpu",
        lr=1e-3,
        half_precision=False,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


@pytest.mark.slow
def test_end_to_end_train_and_resume(toy_dataset, tmp_path, capsys):
    import train as train_cli

    cfg = _base_cfg(toy_dataset, tmp_path)
    train_cli.main(cfg)

    out = tmp_path / "output"
    assert (out / "class_indices.json").exists()
    with open(out / "class_indices.json") as f:
        assert json.load(f) == {"0": "cat", "1": "dog", "2": "fox"}
    assert (out / "checkpoint-0.pth").exists()
    assert (out / "checkpoint-1.pth").exists()
    assert (out / "checkpoint-best.pth").exists()
    # JSON-line epoch log (reference train.py:391-397 writes train_cls/log.txt)
    log_file = out.parent / "log.txt"
    assert log_file.exists()
    lines = [json.loads(l) for l in open(log_file)]
    assert len(lines) == 2
    assert "train_loss" in lines[0] and "test_acc1" in lines[0]

    # resume: epochs=3 → continues from epoch 2 only
    cfg2 = _base_cfg(toy_dataset, tmp_path, epochs=3)
    train_cli.main(cfg2)
    assert cfg2.start_epoch == 2  # auto-resumed from checkpoint-1
    lines = [json.loads(l) for l in open(log_file)]
    assert len(lines) == 3
    assert lines[-1]["epoch"] == 2


@pytest.mark.slow
def test_end_to_end_mixup_ema(toy_dataset, tmp_path):
    import train as train_cli

    cfg = _base_cfg(
        toy_dataset, tmp_path,
        epochs=1, mixup=0.8, cutmix=1.0, smoothing=0.1,
        model_ema=True, reprob=0.25, aa="rand-m9-mstd0.5-inc1",
        model="convnext_atto", drop_path=0.1,
    )
    train_cli.main(cfg)
    out = tmp_path / "output"
    assert (out / "checkpoint-0.pth").exists()
    assert (out / "checkpoint-best-ema.pth").exists()
    import pickle

    with open(out / "checkpoint-0.pth", "rb") as f:
        ck = pickle.load(f)
    assert "model_ema" in ck
    assert ck["num_classes"] == 3
    assert ck["model_spec"]["name"] == "convnext_atto"


@pytest.mark.slow
def test_eval_only_mode(toy_dataset, tmp_path, capsys):
    import train as train_cli

    cfg = _base_cfg(toy_dataset, tmp_path, epochs=1)
    train_cli.main(cfg)
    cfg2 = _base_cfg(toy_dataset, tmp_path, eval=True)
    train_cli.main(cfg2)
    captured = capsys.readouterr()
    assert "Eval only mode" in captured.out


@pytest.mark.slow
def test_end_to_end_update_freq(toy_dataset, tmp_path):
    """Gradient accumulation through the real CLI: update_freq=2 halves the
    optimizer steps per epoch but still trains and checkpoints."""
    import train as train_cli

    cfg = _base_cfg(toy_dataset, tmp_path, epochs=2, update_freq=2)
    train_cli.main(cfg)
    out = tmp_path / "output"
    assert (out / "checkpoint-1.pth").exists()
    import json as _json

    lines = [_json.loads(l) for l in open(out.parent / "log.txt")]
    assert len(lines) == 2
    assert lines[-1]["train_loss"] < lines[0]["train_loss"] * 1.5  # sane


@pytest.mark.slow
def test_pretrained_ema_reseed_and_prune_mask_finetune(toy_dataset, tmp_path):
    """(a) --pretrained_path + --model_ema: the EMA shadow must start from
    the LOADED weights, not the random init (timm ModelEmaV3 copies after
    load); (b) --prune_mask: a pruned checkpoint fine-tuned through the real
    CLI keeps its sparsity in the saved artifacts."""
    import pickle

    import train as train_cli

    cfg = _base_cfg(toy_dataset, tmp_path / "src")
    train_cli.main(cfg)
    src = tmp_path / "src" / "output" / "checkpoint-best.pth"

    from modelchange import prune_model

    pruned = prune_model(str(src), sparsity=0.5, scope="per_kernel")

    cfg2 = _base_cfg(
        toy_dataset, tmp_path / "ft", epochs=1, model_ema=True,
        pretrained=True, pretrained_path=pruned, prune_mask=True,
        auto_resume=False,
    )
    train_cli.main(cfg2)
    with open(tmp_path / "ft" / "output" / "checkpoint-0.pth", "rb") as f:
        ck = pickle.load(f)
    with open(pruned, "rb") as f:
        src_ck = pickle.load(f)
    for k, v in ck["model"].items():
        if k.endswith("kernel") and v.ndim >= 2 and v.size > 4096:
            src_zero = src_ck["model"][k] == 0
            # (b) the pruned zero pattern survived an epoch of fine-tuning
            assert np.all(v[src_zero] == 0), k
            # (a) the saved EMA kept the same zeros — it was seeded from the
            # loaded (pruned) weights, so masked entries never left zero
            assert np.all(ck["model_ema"][k][src_zero] == 0), k


@pytest.mark.slow
def test_preemption_signal_checkpoints_and_resumes(
    toy_dataset, tmp_path, capsys, monkeypatch
):
    """SIGTERM mid-run → checkpoint after the current epoch + clean exit;
    a relaunch auto-resumes at epoch+1 (SLURM grace-signal path on top of
    the reference's submitit requeue, run_with_submitit.py:48-56)."""
    import signal as _signal

    import train as train_cli

    real = train_cli.train_one_epoch
    calls = {"n": 0}

    def wrapped(*a, **kw):
        out = real(*a, **kw)
        if calls["n"] == 0:  # deliver the grace signal during epoch 0
            _signal.raise_signal(_signal.SIGTERM)
        calls["n"] += 1
        return out

    monkeypatch.setattr(train_cli, "train_one_epoch", wrapped)
    # save_ckpt_freq=3: epoch 0 would NOT normally checkpoint — only the
    # preemption path can produce checkpoint-0.pth
    cfg = _base_cfg(toy_dataset, tmp_path, epochs=4, save_ckpt_freq=3)
    train_cli.main(cfg)
    captured = capsys.readouterr().out
    assert "Received signal" in captured
    assert "Preemption checkpoint at epoch 0" in captured

    out = tmp_path / "output"
    assert (out / "checkpoint-0.pth").exists()
    assert not (out / "checkpoint-1.pth").exists()
    lines = [json.loads(l) for l in open(out.parent / "log.txt")]
    assert len(lines) == 1  # exactly one epoch ran

    # requeued job resumes at epoch 1 (auto_resume scan)
    monkeypatch.setattr(train_cli, "train_one_epoch", real)
    cfg2 = _base_cfg(toy_dataset, tmp_path, epochs=2, save_ckpt_freq=3)
    train_cli.main(cfg2)
    captured = capsys.readouterr().out
    assert "Auto resume checkpoint" in captured
    lines = [json.loads(l) for l in open(out.parent / "log.txt")]
    assert len(lines) == 2
    assert lines[-1]["epoch"] == 1
