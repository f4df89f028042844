"""run_with_submitit.py exercised against a mock submitit module (submitit is
absent from the image; reference C23 semantics: one task per host, rendezvous
env wiring, elastic requeue with auto_resume — run_with_submitit.py:48-67)."""

import os
import sys
import types

import pytest


class _MockJobEnv:
    hostnames = ["host0", "host1"]
    job_id = "4242"
    global_rank = 1
    num_tasks = 2


class _MockJob:
    job_id = "4242"


class _MockExecutor:
    instances = []

    def __init__(self, folder=None, slurm_max_num_timeout=None):
        self.folder = folder
        self.slurm_max_num_timeout = slurm_max_num_timeout
        self.params = {}
        self.submitted = []
        _MockExecutor.instances.append(self)

    def update_parameters(self, **kw):
        self.params.update(kw)

    def submit(self, fn):
        self.submitted.append(fn)
        return _MockJob()


class _DelayedSubmission:
    def __init__(self, fn, *a, **k):
        self.fn = fn


def _make_mock_submitit():
    m = types.ModuleType("submitit")
    m.JobEnvironment = _MockJobEnv
    m.AutoExecutor = _MockExecutor
    m.helpers = types.SimpleNamespace(DelayedSubmission=_DelayedSubmission)
    return m


@pytest.fixture
def mock_submitit(monkeypatch):
    m = _make_mock_submitit()
    monkeypatch.setitem(sys.modules, "submitit", m)
    return m


def test_launcher_submits_one_task_per_host(mock_submitit, monkeypatch, tmp_path):
    import run_with_submitit as L

    monkeypatch.setattr(
        sys, "argv",
        ["run_with_submitit.py", "--nodes", "4", "--timeout", "60",
         "--partition", "tpu-pod", "--job_dir", str(tmp_path),
         "--data_path", "/data/x"],
    )
    _MockExecutor.instances.clear()
    L.main()
    ex = _MockExecutor.instances[-1]
    assert ex.params["nodes"] == 4
    assert ex.params["tasks_per_node"] == 1          # one task per TPU host
    assert ex.params["timeout_min"] == 60
    assert ex.params["slurm_partition"] == "tpu-pod"
    assert ex.params["slurm_signal_delay_s"] == 120  # reference :98 grace
    assert len(ex.submitted) == 1
    assert isinstance(ex.submitted[0], L.Trainer)


def test_trainer_checkpoint_requeues_with_auto_resume(mock_submitit):
    import run_with_submitit as L

    args = types.SimpleNamespace(auto_resume=False, data_path="/d")
    trainer = L.Trainer(args)
    sub = trainer.checkpoint()
    assert isinstance(sub, _DelayedSubmission)
    assert args.auto_resume is True                  # elastic-resume semantics
    assert isinstance(sub.fn, L.Trainer) and sub.fn is not trainer


def test_trainer_sets_rendezvous_env(mock_submitit, monkeypatch):
    import run_with_submitit as L

    for k in ("MASTER_ADDR", "MASTER_PORT", "RANK", "WORLD_SIZE"):
        # register the key with monkeypatch so the values the Trainer writes
        # into os.environ are removed at teardown (they would otherwise leak
        # and flip later train.py tests into the distributed bootstrap path)
        monkeypatch.setenv(k, "sentinel")
        monkeypatch.delenv(k)
    trainer = L.Trainer(types.SimpleNamespace())
    trainer._setup_dist_env()
    assert os.environ["MASTER_ADDR"] == "host0"      # coordinator = host 0
    assert os.environ["RANK"] == "1"
    assert os.environ["WORLD_SIZE"] == "2"
    assert os.environ["MASTER_PORT"].isdigit()


def test_main_errors_clearly_without_submitit(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_submitit(name, *a, **k):
        if name == "submitit":
            raise ImportError("absent")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_submitit)
    monkeypatch.delitem(sys.modules, "submitit", raising=False)
    monkeypatch.setattr(sys, "argv", ["run_with_submitit.py"])
    import run_with_submitit as L

    with pytest.raises(SystemExit, match="submitit is required"):
        L.main()
