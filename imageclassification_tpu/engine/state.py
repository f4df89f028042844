"""Train state: one pytree carrying everything the jit step mutates.

The reference spreads this across a DDP-wrapped nn.Module, a torch optimizer,
a GradScaler, and a ModelEmaV3 object (train.py:194-231). Here it is a single
donated pytree: params + BN stats + optimizer state + optional EMA copy +
optional gradient-accumulation buffer + the step counter. Donation lets XLA
update everything in place — no per-step allocations in steady state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..optim.ema import init_ema


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                 # micro-step counter (int32)
    params: Any
    batch_stats: Any                  # {} for BN-free models
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None  # timm ModelEmaV3 EMAs BN buffers too
    grad_accum: Optional[Any] = None  # populated when update_freq > 1

    @property
    def has_ema(self):
        return self.ema_params is not None


def create_train_state(
    model,
    tx,
    rng,
    input_shape,
    use_ema: bool = False,
    update_freq: int = 1,
) -> TrainState:
    """Initialize params/stats/opt-state host-side (placement happens later via
    parallel.mesh.shard_params)."""
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros(input_shape, jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    ema_params = init_ema(params) if use_ema else None
    ema_batch_stats = init_ema(batch_stats) if (use_ema and batch_stats) else None
    grad_accum = (
        jax.tree.map(jnp.zeros_like, params) if update_freq > 1 else None
    )
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema_params,
        ema_batch_stats=ema_batch_stats,
        grad_accum=grad_accum,
    )


def num_params(state: TrainState) -> int:
    return sum(p.size for p in jax.tree.leaves(state.params))
