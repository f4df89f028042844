"""Distributed runtime & process bootstrap (reference C20: utils.py:288-375).

The reference joins an NCCL communicator via torch.distributed with three env
conventions (OMPI / torchrun / SLURM). The TPU-native equivalent is
`jax.distributed.initialize()` — one process per host, coordinator address instead
of dist_url — after which every process sees the global device set and a single
`Mesh` spans all chips. Collectives ride ICI within a slice and DCN across slices;
there is no explicit communicator management.

Rank-0 print gating mirrors utils.py:288-300.
"""

from __future__ import annotations

import builtins
import datetime
import os

import jax


def _env_int(*names, default=None):
    for n in names:
        if n in os.environ:
            return int(os.environ[n])
    return default


def init_distributed_mode(args) -> None:
    """Initialize multi-process JAX if a launcher environment is detected.

    Mirrors the reference's three conventions (utils.py:341-360):
      * OMPI (`OMPI_COMM_WORLD_*`) when --dist_on_itp
      * explicit RANK/WORLD_SIZE (torchrun-style)
      * SLURM (SLURM_PROCID/SLURM_NTASKS)
    plus JAX-native: on Cloud TPU pods `jax.distributed.initialize()` needs no args.
    Falls back to single-process mode (args.distributed=False, utils.py:361-364).
    """
    rank = world = coordinator = None
    if args.dist_on_itp:
        rank = _env_int("OMPI_COMM_WORLD_RANK")
        world = _env_int("OMPI_COMM_WORLD_SIZE")
        coordinator = os.environ.get("MASTER_ADDR", "127.0.0.1") + ":" + os.environ.get("MASTER_PORT", "12355")
    elif "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        rank = _env_int("RANK")
        world = _env_int("WORLD_SIZE")
        addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator = f"{addr}:{port}"
    elif "SLURM_PROCID" in os.environ and _env_int("SLURM_NTASKS", default=1) > 1:
        rank = _env_int("SLURM_PROCID")
        world = _env_int("SLURM_NTASKS")
        coordinator = args.dist_url.replace("tcp://", "") if args.dist_url.startswith("tcp://") else None
    elif (
        len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    ):
        # Cloud TPU pod (>1 host): jax.distributed auto-discovers everything.
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # backend already up (single-host dev loop) — continue single-process
            print(f"Not using distributed mode ({e})")
            args.distributed = False
            args.rank = 0
            args.world_size = 1
            return
        args.distributed = True
        args.rank = jax.process_index()
        args.world_size = jax.process_count()
        setup_for_distributed(args.rank == 0)
        print(f"| distributed init (TPU pod): rank {args.rank}/{args.world_size}", flush=True)
        return

    if world is None or world <= 1:
        print("Not using distributed mode")
        args.distributed = False
        args.rank = 0
        args.world_size = 1
        return

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=world, process_id=rank
    )
    args.distributed = True
    args.rank = jax.process_index()
    args.world_size = jax.process_count()
    print(f"| distributed init (rank {args.rank}): {coordinator}", flush=True)
    setup_for_distributed(args.rank == 0)


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def any_process(flag: bool) -> bool:
    """True iff `flag` is True on ANY process (max-reduce across hosts).

    Collective-safe decision making: use this before any action that runs
    collectives (checkpoint gathers) or changes control flow (loop exit),
    so every process takes the same branch — e.g. SLURM grace signals land
    on hosts with skew (train.py preemption path)."""
    if get_world_size() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    import numpy as np

    got = multihost_utils.process_allgather(
        np.asarray([1.0 if flag else 0.0], np.float32)
    )
    return bool(np.max(got) > 0)


def setup_for_distributed(is_master: bool) -> None:
    """Disable printing on non-master processes (reference utils.py:288-300).

    `force=True` kwarg overrides the gate, and forced prints are timestamped —
    matching the reference's behavior.
    """
    builtin_print = builtins.print

    def print_gated(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            if force:
                now = datetime.datetime.now().time()
                builtin_print("[{}] ".format(now), end="")
            builtin_print(*args, **kwargs)

    builtins.print = print_gated


def save_on_master(save_fn, *args, **kwargs):
    """Run a save callable on rank 0 only (reference utils.py:335-337)."""
    if is_main_process():
        return save_fn(*args, **kwargs)
    return None
