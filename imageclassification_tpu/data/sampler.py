"""Epoch index sampling (reference: DistributedSampler train.py:130-136 and
RASampler utils.py:17-63).

In the TPU design the "sampler" is pure index math on the host: given the epoch
and seed, produce the per-process sequence of sample indices, truncated so every
epoch has a static number of full global batches (static shapes keep the jit step
compile-once; the reference's `drop_last=True` train loader, train.py:158, has the
same effect).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np


def epoch_batch_indices(
    n_samples: int,
    global_batch: int,
    epoch: int,
    seed: int,
    rank: int = 0,
    world: int = 1,
    shuffle: bool = True,
) -> np.ndarray:
    """Return local indices for one epoch, shape [steps, local_batch].

    Matches DistributedSampler semantics: epoch-seeded global permutation
    (generator seed = seed + epoch), round-robin sharding over ranks, and
    drop_last truncation to full global batches."""
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        perm = g.permutation(n_samples)
    else:
        perm = np.arange(n_samples)
    # Pad to a multiple of world (DistributedSampler wraps around).
    total = int(math.ceil(n_samples / world)) * world
    if total > n_samples:
        perm = np.concatenate([perm, perm[: total - n_samples]])
    local = perm[rank::world]
    local_batch = global_batch // world
    steps = len(local) // local_batch
    return local[: steps * local_batch].reshape(steps, local_batch)


def ra_epoch_batch_indices(
    n_samples: int,
    global_batch: int,
    epoch: int,
    seed: int,
    rank: int = 0,
    world: int = 1,
    num_repeats: int = 3,
) -> np.ndarray:
    """Repeated-augmentation sampler (reference RASampler, utils.py:17-63).

    DeiT-style: each sample index appears `num_repeats` times in the epoch-seeded
    shuffled sequence, round-robin sharded so the copies land on different ranks
    (utils.py:54), truncated to floor(len/256)*256/world per rank (utils.py:36-38,57).
    """
    g = np.random.default_rng(seed + epoch)
    perm = g.permutation(n_samples)
    repeated = np.repeat(perm, num_repeats)        # [n*3], copies adjacent
    total_size = int(math.ceil(num_repeats * n_samples / world)) * world
    if total_size > len(repeated):
        repeated = np.concatenate([repeated, repeated[: total_size - len(repeated)]])
    local = repeated[rank::world]
    num_selected = int(math.floor(n_samples // 256 * 256 / world))
    if num_selected > 0:
        local = local[:num_selected]
    local_batch = global_batch // world
    steps = len(local) // local_batch
    return local[: steps * local_batch].reshape(steps, local_batch)


def eval_batches(
    n_samples: int, batch_size: int, rank: int = 0, world: int = 1
) -> List[np.ndarray]:
    """Sequential eval batches, sharded across processes.

    `batch_size` is the LOCAL per-process batch; global step s covers samples
    [s*B*world, (s+1)*B*world) with process r taking the r-th contiguous
    slice — shards are disjoint, so summed device-side counts give exactly
    n_samples once. Short/empty slices are padded with -1 sentinels (static
    shapes for the jit eval step; pads are masked device-side).

    The reference instead evaluates the FULL val set on every rank
    (SequentialSampler, train.py:139) — duplicated decode work and inflated
    counts; fixed rather than reproduced here."""
    global_batch = batch_size * world
    steps = max(1, math.ceil(n_samples / global_batch))
    out = []
    for s in range(steps):
        start = s * global_batch + rank * batch_size
        stop = min(start + batch_size, n_samples)
        idx = np.arange(start, max(start, stop))
        if len(idx) < batch_size:
            idx = np.concatenate(
                [idx, np.full(batch_size - len(idx), -1, dtype=np.int64)]
            )
        out.append(idx)
    return out
