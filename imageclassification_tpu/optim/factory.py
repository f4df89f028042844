"""Optimizer factory (reference C9: optim_factory.py:50-122).

Name-for-name optax equivalents of the reference's 20+ optimizer table. Two
deliberate departures, both TPU-idiomatic:

  * `fused*` aliases map to the plain optax versions — apex fused CUDA kernels
    exist because torch eager launches one kernel per op; XLA fuses the whole
    optax update lambda into the train step already (SURVEY §2.3 last row).
  * per-step LR/WD are injected hyperparameters gathered from the schedule
    arrays INSIDE the jit step (optax.inject_hyperparams), replacing the
    reference's Python-side param_group mutation (engine.py:33-38).

Reference semantics preserved:
  * `get_parameter_groups` with filter_bias_and_bn=True puts ALL trainable params
    in one decay group (the bias/BN split is vestigial — optim_factory.py:23-47),
    so weight decay applies to every parameter; we reproduce that (no mask).
  * coupled (L2-style) vs decoupled decay follows each torch optimizer's own
    behavior: adam/sgd/rmsprop/etc. add wd*p to the gradient; adamw/lion/adamp/
    sgdp decay the weights directly.
  * `lookahead_` prefix wraps with Lookahead (optim_factory.py:118-120).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from . import custom

# torch-coupled-L2 optimizers: wd enters through the raw gradient.
# NOT here: adafactor (timm applies decoupled lr-scaled decay —
# optax.adafactor's weight_decay_rate) and nvnovograd (timm adds wd*p to
# the NORMALIZED gradient — optax.scale_by_novograd's weight_decay).
_COUPLED_WD = {
    "sgd", "nesterov", "momentum", "adam", "nadam", "radam", "adadelta",
    "rmsprop", "rmsproptf",
}

KNOWN_OPTIMIZERS = sorted(
    _COUPLED_WD
    | {"adamw", "lion", "adamp", "sgdp", "lamb", "adahessian",
       "adafactor", "nvnovograd",
       "fusedsgd", "fusedmomentum", "fusedadam", "fusedadamw", "fusedlamb",
       "fusednovograd"}
)


def _coupled_wd(weight_decay) -> optax.GradientTransformation:
    """L2 regularization: g <- g + wd * p (torch's coupled weight_decay)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params):
        new_updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _make_chain(
    opt_name: str,
    learning_rate,
    weight_decay,
    momentum: float = 0.9,
    eps: float = 1e-8,
    betas=None,
    layer_scales=None,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the transformation chain for one optimizer name.

    Per-leaf `layer_scales` (layer-wise LR decay, reference D3) multiply the
    update just before the LR scale."""
    opt = opt_name
    b1, b2 = (betas if betas else (0.9, 0.999))

    pre = []
    if clip_grad is not None:
        # reference clips AFTER unscale, before step (utils.py:437-440)
        pre.append(optax.clip_by_global_norm(clip_grad))
    if opt in _COUPLED_WD:
        pre.append(_coupled_wd(weight_decay))

    post = []
    if layer_scales is not None:
        post.append(_scale_by_leaf(layer_scales))

    if opt in ("sgd", "nesterov"):
        core = [optax.trace(decay=momentum, nesterov=True)]
    elif opt == "momentum":
        core = [optax.trace(decay=momentum, nesterov=False)]
    elif opt == "adam":
        core = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
    elif opt == "adamw":
        core = [
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
        ]
    elif opt == "lion":
        # reference: Lion(parameters, betas=(momentum, 0.999)) — optim_factory.py:80
        core = [
            optax.scale_by_lion(b1=momentum, b2=0.999),
            optax.add_decayed_weights(weight_decay),
        ]
    elif opt == "nadam":
        core = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps, nesterov=True)]
    elif opt == "radam":
        core = [optax.scale_by_radam(b1=b1, b2=b2, eps=eps)]
    elif opt == "adamp":
        return optax.chain(
            *pre,
            custom.adamp(learning_rate, b1=b1, b2=b2, eps=eps,
                         weight_decay=weight_decay, nesterov=True),
            *post,
        )
    elif opt == "sgdp":
        return optax.chain(
            *pre,
            custom.sgdp(learning_rate, momentum=momentum,
                        weight_decay=weight_decay, nesterov=True),
            *post,
        )
    elif opt == "adahessian":
        # decoupled decay like torch-adahessian (p *= 1 - lr*wd)
        core = [
            custom.scale_by_adahessian(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
        ]
    elif opt == "adadelta":
        core = [optax.scale_by_adadelta(eps=eps)]
    elif opt == "adafactor":
        return optax.chain(
            *pre,
            optax.adafactor(learning_rate=learning_rate,
                            weight_decay_rate=weight_decay),
            *post,
        )
    elif opt in ("rmsprop", "rmsproptf"):
        # torch RMSprop(alpha=0.9, momentum=0.9); rmsproptf additionally
        # initializes the accumulator to 1 and adds eps inside the sqrt —
        # optax.scale_by_rms(initial_scale=1., eps_in_sqrt=True) covers both.
        core = [
            optax.scale_by_rms(
                decay=0.9,
                eps=eps,
                initial_scale=1.0 if opt == "rmsproptf" else 0.0,
                eps_in_sqrt=opt == "rmsproptf",
            ),
            optax.trace(decay=momentum, nesterov=False),
        ]
    elif opt == "nvnovograd":
        core = [optax.scale_by_novograd(b1=0.95, b2=0.98, eps=eps,
                                        weight_decay=weight_decay)]
    elif opt == "lamb":
        core = [
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_trust_ratio(),
        ]
    else:
        raise ValueError(f"Invalid optimizer: {opt_name}")

    return optax.chain(*pre, *core, *post, optax.scale_by_learning_rate(learning_rate))


def _scale_by_leaf(scales) -> optax.GradientTransformation:
    """Multiply each update leaf by a per-leaf scalar (layer-wise LR decay)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(
    opt: str,
    lr: float,
    weight_decay: float,
    params_or_model: Any = None,
    opt_eps: float = 1e-8,
    opt_betas=None,
    clip_grad: Optional[float] = None,
    layer_scales=None,
    filter_bias_and_bn: bool = True,
) -> optax.GradientTransformation:
    """Name-routed factory (reference optim_factory.py:50-122).

    Returns an inject_hyperparams-wrapped transformation whose state carries
    `hyperparams['learning_rate']` and `hyperparams['weight_decay']`, updated
    per-step inside the jit step from the schedule arrays."""
    opt_lower = opt.lower()
    momentum = 0.9

    opt_split = opt_lower.split("_")
    base = opt_split[-1]
    # fused* → plain versions (XLA fuses the update; SURVEY §2.3)
    alias = {
        "fusedsgd": "sgd", "fusedmomentum": "momentum", "fusedadam": "adam",
        "fusedadamw": "adamw", "fusedlamb": "lamb", "fusednovograd": "nvnovograd",
    }
    base = alias.get(base, base)
    if base not in KNOWN_OPTIMIZERS:
        raise ValueError(f"Invalid optimizer: {opt}")

    def builder(learning_rate, weight_decay):
        return _make_chain(
            base,
            learning_rate,
            weight_decay,
            momentum=momentum,
            eps=opt_eps,
            betas=opt_betas,
            layer_scales=layer_scales,
            clip_grad=clip_grad,
        )

    tx = optax.inject_hyperparams(builder)(
        learning_rate=jnp.asarray(lr, jnp.float32),
        weight_decay=jnp.asarray(weight_decay, jnp.float32),
    )

    if len(opt_split) > 1 and opt_split[0] == "lookahead":
        tx = custom.lookahead(tx, sync_period=6, slow_step_size=0.5)
    return tx


def set_hyperparams(opt_state, lr, wd):
    """Write per-step schedule values into the optimizer state (the jit-step
    replacement for the reference's param_group mutation, engine.py:33-38).
    Recurses through wrapper states (e.g. lookahead) to reach the
    InjectHyperparamsState."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        hp["weight_decay"] = jnp.asarray(wd, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    if hasattr(opt_state, "inner"):
        return opt_state._replace(inner=set_hyperparams(opt_state.inner, lr, wd))
    raise TypeError(f"cannot inject hyperparams into {type(opt_state).__name__}")


def uses_lookahead(opt: str) -> bool:
    return opt.lower().split("_")[0] == "lookahead"


def needs_hessian(opt: str) -> bool:
    """True when the optimizer consumes a Hutchinson Hessian-diagonal estimate
    (the train step then computes it via jvp-of-grad and passes it as the
    `hessian_diag` extra arg)."""
    return opt.lower().split("_")[-1] == "adahessian"
