"""Model EMA as a pure pytree transform (reference C8: timm ModelEmaV3,
train.py:198-201, engine.py:67-77).

Semantics preserved exactly:
  * decay 0.9995 (train.py:201), applied per REAL optimizer update — with
    gradient accumulation (update_freq>1) the EMA advances only when the
    optimizer steps (engine.py:67,76), a cadence SURVEY §7 calls out;
  * val.py rebuilds with decay 0.999 (val.py:17) — decay is a runtime arg here;
  * resume either restores the stored EMA or re-seeds from the model
    (`model_ema.set(model)`, utils.py:599-603) — `init_ema` is that re-seed.

On TPU the whole update is one fused elementwise kernel over each leaf; there is
no separate "EMA model object", just a second param pytree in the train state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    """Seed EMA with a COPY of the params (timm ModelEmaV3.set). Must be a real
    copy — aliasing the param buffers breaks donation of the train state
    (XLA rejects donating the same buffer twice)."""
    return jax.tree.map(jnp.copy, params)


def warmup_decay(decay, n_updates):
    """Effective decay under warmup (timm ModelEmaV3 use_warmup semantics):
    min(decay, (1+t)/(10+t)) at real update t — the TF ExponentialMovingAverage
    / Adam debiasing ramp. Early updates use a small decay, so the EMA forgets
    the init weights immediately instead of carrying them for ~1/(1-decay)
    updates (the mean lag of a constant-decay EMA). `n_updates` may be traced."""
    t = jnp.asarray(n_updates, jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + t) / (10.0 + t))


def ema_update(ema_params, params, decay, do_update=True):
    """ema ← d·ema + (1−d)·p, gated by `do_update` (a traced bool is fine —
    jnp.where keeps the step compile-once across the accumulation cadence).
    `decay` may be a traced scalar (warmup_decay output)."""
    d = jnp.asarray(decay, jnp.float32)

    def one(e, p):
        new = e * d + p.astype(e.dtype) * (1.0 - d)
        if isinstance(do_update, bool):
            return new if do_update else e
        return jnp.where(do_update, new, e)

    return jax.tree.map(one, ema_params, params)
