"""Optimizers the reference pulls from timm that optax lacks (reference C9:
optim_factory.py:66-99): AdamP, SGDP, RMSpropTF-style rmsprop.

AdamP / SGDP (Heo et al. 2020): for scale-invariant weights (those followed by a
normalization layer), the effective step grows as the weight norm grows; AdamP
projects the radial component out of the update when the gradient is nearly
orthogonal to the weight, and damps weight decay by `wd_ratio` there. The timm
implementation tries a channel view then a layer view; we implement the layer
view (whole-tensor cosine), which is the binding case for conv/linear kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _unit(x, eps):
    return x / (jnp.linalg.norm(x.reshape(-1)) + eps)


def _projection(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """Project the radial (along-p) component out of `perturb` when grad ⟂ p.

    Returns (perturb, wd_scale). Applies only to tensors with ndim >= 2."""
    if p.ndim < 2:
        return perturb, jnp.asarray(1.0, p.dtype)
    pv = p.reshape(-1)
    gv = grad.reshape(-1)
    cos = jnp.abs(jnp.vdot(_unit(pv, eps), _unit(gv, eps)))
    cond = cos < delta / jnp.sqrt(jnp.asarray(pv.size, p.dtype))
    p_n = p / (jnp.linalg.norm(pv) + eps)
    projected = perturb - p_n * jnp.sum((p_n * perturb).reshape(-1))
    perturb = jnp.where(cond, projected, perturb)
    wd_scale = jnp.where(cond, jnp.asarray(wd_ratio, p.dtype), jnp.asarray(1.0, p.dtype))
    return perturb, wd_scale


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamp(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay=0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.01,
    nesterov: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count

        def one(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            if nesterov:
                pert = (b1 * m + (1 - b1) * g) / bc1 / denom
            else:
                pert = m / bc1 / denom
            pert, wd_scale = _projection(p, g, pert, delta, wd_ratio, eps)
            # decoupled decay damped by wd_ratio on projected tensors
            decay = weight_decay * wd_scale * p
            return -(learning_rate * (pert + decay))

        new_updates = jax.tree.map(one, params, updates, mu, nu)
        return new_updates, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: optax.Params
    inner: optax.OptState


def lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 6,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """Lookahead wrapper (reference `lookahead_` prefix, optim_factory.py:118-120).

    Unlike optax.lookahead (which requires a LookaheadParams pair as the param
    pytree), this keeps the slow weights inside the optimizer state so the rest
    of the framework sees one ordinary param pytree. Every `sync_period` fast
    steps, the fast weights are pulled toward the slow copy:
      slow ← slow + α (fast − slow);  fast ← slow.
    """

    def init_fn(params):
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree.map(jnp.asarray, params),
            inner=inner.init(params),
        )

    def update_fn(updates, state, params, **extra_args):
        # forward extra args (e.g. adahessian's hessian_diag) to the inner
        # transformation so `lookahead_adahessian` composes
        inner_updates, inner_state = inner.update(
            updates, state.inner, params, **extra_args
        )
        count = state.count + 1
        sync = count % sync_period == 0

        def one(u, p, s):
            fast = p + u
            slow_new = jnp.where(sync, s + slow_step_size * (fast - s), s)
            final = jnp.where(sync, slow_new, fast)
            return final - p, slow_new

        pairs = jax.tree.map(one, inner_updates, params, state.slow)
        new_updates = jax.tree.map(lambda t: t[0], pairs, is_leaf=lambda t: isinstance(t, tuple))
        new_slow = jax.tree.map(lambda t: t[1], pairs, is_leaf=lambda t: isinstance(t, tuple))
        return new_updates, LookaheadState(count=count, slow=new_slow, inner=inner_state)

    # ExtraArgs so optax.chain/with_extra_args_support does not silently
    # swallow hessian_diag before it reaches the forwarding above
    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


class SGDPState(NamedTuple):
    momentum: optax.Updates


def sgdp(
    learning_rate,
    momentum: float = 0.9,
    weight_decay=0.0,
    dampening: float = 0.0,
    nesterov: bool = True,
    delta: float = 0.1,
    wd_ratio: float = 0.01,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init_fn(params):
        return SGDPState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params):
        buf = jax.tree.map(
            lambda b, g: momentum * b + (1 - dampening) * g, state.momentum, updates
        )

        def one(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, wd_scale = _projection(p, g, d_p, delta, wd_ratio, eps)
            # torch SGDP: p *= 1 - lr*wd*wd_ratio/(1-momentum) applied as decay
            decay = weight_decay * wd_scale / (1 - momentum) * p
            return -(learning_rate * (d_p + decay))

        new_updates = jax.tree.map(one, params, updates, buf)
        return new_updates, SGDPState(momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)


class AdaHessianState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates        # EMA of squared (spatially-averaged) Hessian diag


def _avg_spatial_abs(d):
    """AdaHessian conv-kernel trick: average |diag| over the kernel's spatial
    dims (torch adahessian avg_conv_kernel on [O,I,kh,kw]; flax layout is
    [kh,kw,I,O] so the spatial dims are the leading two)."""
    if d.ndim == 4:
        return jnp.broadcast_to(
            jnp.mean(jnp.abs(d), axis=(0, 1), keepdims=True), d.shape
        )
    return d


def scale_by_adahessian(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    hessian_power: float = 1.0,
) -> optax.GradientTransformationExtraArgs:
    """AdaHessian (Yao et al. 2020) second-moment-from-Hessian scaling
    (reference optim_factory.py:95 routes 'adahessian' to torch adahessian).

    Adam-shaped update with the squared gradient replaced by the squared
    Hutchinson estimate of the Hessian diagonal. The estimate cannot be formed
    from gradients alone, so it arrives as the extra arg `hessian_diag`
    (z * d/dp[grad·z], computed with one jax.jvp through the grad function in
    the train step — engine/step.py)."""

    def init_fn(params):
        return AdaHessianState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None, *, hessian_diag=None, **extra):
        del params, extra
        if hessian_diag is None:
            raise ValueError(
                "adahessian needs the `hessian_diag` extra arg (the train "
                "step computes it when args.opt selects adahessian)"
            )
        count = state.count + 1
        d = jax.tree.map(_avg_spatial_abs, hessian_diag)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, h: b2 * v + (1 - b2) * h * h, state.nu, d)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        k = hessian_power / 2.0

        def step(m, v):
            denom = (v / c2) ** k + eps
            return (m / c1) / denom

        return jax.tree.map(step, mu, nu), AdaHessianState(count, mu, nu)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
