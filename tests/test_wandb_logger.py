"""WandbLogger exercised against a mock wandb module (wandb is absent from
the image, so without this the C15 logger path would never execute — its
semantics mirror reference utils.py:231-285)."""

import sys
import types

import pytest

from imageclassification_tpu.config import TrainConfig


class _MockRun:
    id = "run123"


class _MockArtifact:
    def __init__(self, name, type):
        self.name = name
        self.type = type
        self.dirs = []

    def add_dir(self, d):
        self.dirs.append(d)


def _make_mock_wandb():
    m = types.ModuleType("wandb")
    m.run = None
    m.logged = []
    m.defined = []
    m.artifacts = []

    def init(project=None, config=None):
        m.run = _MockRun()
        m.init_args = {"project": project, "config": config}

    def log(payload, commit=True):
        m.logged.append((dict(payload), commit))

    def define_metric(name, step_metric=None):
        m.defined.append((name, step_metric))

    def log_artifact(artifact, aliases=None):
        m.artifacts.append((artifact, aliases))

    m.init = init
    m.log = log
    m.define_metric = define_metric
    m.log_artifact = log_artifact
    m.Artifact = _MockArtifact
    return m


@pytest.fixture
def mock_wandb(monkeypatch):
    m = _make_mock_wandb()
    monkeypatch.setitem(sys.modules, "wandb", m)
    return m


def test_wandb_logger_full_surface(mock_wandb, tmp_path):
    from imageclassification_tpu.utils.loggers import WandbLogger

    args = TrainConfig(project="proj", output_dir=str(tmp_path))
    logger = WandbLogger(args)
    assert mock_wandb.run is not None
    assert mock_wandb.init_args["project"] == "proj"
    assert isinstance(mock_wandb.init_args["config"], dict)

    logger.set_steps()
    assert ("Rank-0 Batch Wise/*", "Rank-0 Batch Wise/global_train_step") in \
        mock_wandb.defined
    assert ("Global Train/*", "epoch") in mock_wandb.defined
    assert ("Global Test/*", "epoch") in mock_wandb.defined

    # epoch metrics split Train/Test with a final commit (utils.py:251-269)
    logger.log_epoch_metrics({"train_loss": 1.0, "test_acc1": 2.0, "epoch": 3})
    keys = [list(p)[0] for p, _ in mock_wandb.logged if p]
    assert "Global Train/train_loss" in keys
    assert "Global Test/test_acc1" in keys
    assert mock_wandb.logged[-1][0] == {}  # commit marker

    # artifact upload (utils.py:271-278)
    (tmp_path / "checkpoint-0.pth").write_bytes(b"x")
    logger.log_checkpoints()
    art, aliases = mock_wandb.artifacts[-1]
    assert art.name == "run123_model" and art.type == "model"
    assert aliases == ["latest", "best"]
    assert art.dirs == [str(tmp_path)]


def test_wandb_logger_raises_without_module(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("absent")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    from imageclassification_tpu.utils.loggers import WandbLogger

    with pytest.raises(ImportError, match="wandb"):
        WandbLogger(TrainConfig())


def test_engine_drain_batchwise_wandb(mock_wandb):
    """The epoch loop's rank-0 batch-wise logging (reference engine.py:122-132)
    runs against the mock without signature rot."""
    from imageclassification_tpu.utils.loggers import WandbLogger

    args = TrainConfig(project="p")
    logger = WandbLogger(args)
    payload = {
        "Rank-0 Batch Wise/train_loss": 0.5,
        "Rank-0 Batch Wise/global_train_step": 7,
    }
    logger._wandb.log(payload, commit=True)
    assert (payload, True) in mock_wandb.logged
