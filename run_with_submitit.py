"""Cluster launcher with elastic requeue (reference C23: run_with_submitit.py).

The reference submits one task per GPU via submitit/SLURM, with a shared
rendezvous file and automatic requeue-on-preemption that resumes from the last
checkpoint. TPU mapping:

  * one task per HOST (a TPU VM host drives all its local chips — there is no
    per-chip process like one-process-per-GPU DDP);
  * rendezvous = jax.distributed coordinator (MASTER_ADDR:MASTER_PORT env or
    auto-discovery on Cloud TPU pods) instead of a shared-filesystem URI;
  * elastic requeue is identical: on SLURM preemption/timeout submitit calls
    `Trainer.checkpoint()`, which resubmits with auto_resume=True so
    train.py's auto-resume scan (checkpoint/io.py) continues from the latest
    epoch — the same recovery path as the reference (run_with_submitit.py:48-56).

submitit is an optional dependency (not in the TPU image); the CLI degrades
to a clear error telling the user to install it on their SLURM head node.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from imageclassification_tpu.config import get_args_parser, TrainConfig


def parse_args():
    parser = argparse.ArgumentParser(
        "Submitit launcher for TPU classification", parents=[get_args_parser()]
    )
    parser.add_argument("--nodes", default=1, type=int, help="number of TPU hosts")
    parser.add_argument("--tasks_per_node", default=1, type=int)
    parser.add_argument("--timeout", default=72 * 60, type=int, help="minutes")
    parser.add_argument("--job_dir", default="", type=str)
    parser.add_argument("--partition", default="tpu", type=str)
    parser.add_argument("--comment", default="", type=str)
    return parser.parse_args()


def get_shared_folder() -> Path:
    user = os.environ.get("USER", "user")
    for base in ("/checkpoint", os.path.expanduser("~/checkpoint")):
        if Path(base).is_dir():
            p = Path(base) / user / "tpu_cls"
            p.mkdir(parents=True, exist_ok=True)
            return p
    p = Path("/tmp") / user / "tpu_cls"
    p.mkdir(parents=True, exist_ok=True)
    return p


class Trainer:
    def __init__(self, args):
        self.args = args

    def __call__(self):
        self._setup_dist_env()
        import train as classification

        cfg = TrainConfig.from_dict(
            {k: v for k, v in vars(self.args).items()}
        )
        classification.main(cfg)

    def checkpoint(self):
        """Requeue on preemption/timeout with auto-resume (reference
        run_with_submitit.py:48-56)."""
        import submitit

        self.args.auto_resume = True
        print("Requeuing ", self.args)
        empty_trainer = type(self)(self.args)
        return submitit.helpers.DelayedSubmission(empty_trainer)

    def _setup_dist_env(self):
        import submitit

        job_env = submitit.JobEnvironment()
        os.environ.setdefault("MASTER_ADDR", job_env.hostnames[0])
        os.environ.setdefault("MASTER_PORT", str(12500 + hash(job_env.job_id) % 1000))
        os.environ["RANK"] = str(job_env.global_rank)
        os.environ["WORLD_SIZE"] = str(job_env.num_tasks)
        print(f"Process group: {job_env.num_tasks} tasks, rank: {job_env.global_rank}")


def main():
    args = parse_args()
    try:
        import submitit
    except ImportError as e:
        raise SystemExit(
            "submitit is required for cluster launch: pip install submitit "
            "on the SLURM head node (single-host runs need only `python "
            "train.py`; Cloud TPU pods auto-init via jax.distributed)."
        ) from e

    if args.job_dir == "":
        args.job_dir = str(get_shared_folder() / "%j")

    executor = submitit.AutoExecutor(folder=args.job_dir, slurm_max_num_timeout=30)
    executor.update_parameters(
        mem_gb=64 * args.tasks_per_node,
        tasks_per_node=args.tasks_per_node,
        cpus_per_task=16,
        nodes=args.nodes,
        timeout_min=args.timeout,
        slurm_partition=args.partition,
        slurm_signal_delay_s=120,
        **({"slurm_comment": args.comment} if args.comment else {}),
    )
    executor.update_parameters(name="tpu_cls")

    job = executor.submit(Trainer(args))
    print("Submitted job_id:", job.job_id)


if __name__ == "__main__":
    main()
