"""The fused jit train/eval steps (reference C11/C12: engine.py:10-225).

One compiled call per batch does what the reference does in ~10 host round
trips (engine.py:40-97): on-device augmentation → mixup/cutmix → forward →
loss → backward → (accumulate) → clip/grad-norm → optimizer step with per-step
LR/WD gathered from schedule arrays → EMA → device-side metrics (loss, acc,
per-class TP/FP/FN count vectors). The mixup-mode train accuracy's second
no-grad forward on the un-mixed batch (engine.py:89-97) is folded into the same
step. The non-finite-loss skip (engine.py:56-59) is a branchless gate: a
non-finite micro-loss zeroes the accumulated gradient and skips the optimizer
update.

No GradScaler: TPU mixed precision is bfloat16 (same exponent range as fp32),
so the reference's AMP loss-scaling machinery (utils.py:427-453) reduces to
dtype policy + the same grad-norm/clip semantics.

Parallelism: the step is jit-compiled over the mesh; the batch arrives sharded
on the data axis, params replicated (or FSDP-sharded). XLA inserts the gradient
all-reduce where the replicated-param gradient meets the sharded batch — the
DDP backward hook (train.py:219) has no hand-written equivalent here.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.augment import AugmentPipeline, eval_preprocess
from ..data.mixup import MixupConfig, mixup_cutmix, one_hot_smooth
from ..optim.ema import ema_update, warmup_decay
from ..optim.factory import needs_hessian, set_hyperparams
from .state import TrainState


def _per_class_counts(preds, labels, num_classes, weights=None):
    """TP/FP/FN count vectors (reference Python loop engine.py:84-87).

    One-hot contractions instead of scatter-adds: TPU lowers scatters to
    serialized updates, while einsum('bc,b->c') rides the MXU/VPU."""
    if weights is None:
        weights = jnp.ones_like(preds, jnp.float32)
    match = (preds == labels).astype(jnp.float32) * weights
    miss = (preds != labels).astype(jnp.float32) * weights
    lab_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    pred_oh = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    tp = jnp.einsum("bc,b->c", lab_oh, match)
    fp = jnp.einsum("bc,b->c", pred_oh, miss)
    fn = jnp.einsum("bc,b->c", lab_oh, miss)
    return tp, fp, fn


def _global_norm(tree, norm_type: float = 2.0):
    """Global grad norm (reference get_grad_norm_, utils.py:456-468):
    L2 by default; norm_type=inf returns the max absolute element."""
    import math

    if math.isinf(norm_type):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.max(jnp.stack([jnp.max(jnp.abs(l)) for l in leaves]))
    return optax.global_norm(tree)


def build_train_step(
    model,
    tx,
    args,
    num_classes: int,
    mixup_cfg: Optional[MixupConfig],
    lr_schedule,
    wd_schedule,
    ema_decay: float = 0.9995,
    lr_scale_bounds=(1.0, 1.0),
    teacher=None,
    prune_masks=None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `lr_schedule`/`wd_schedule` are device arrays closed over (donated into the
    executable as constants is avoided — they are captured as jit constants,
    which XLA keeps device-resident)."""
    augment = AugmentPipeline(args)
    update_freq = int(args.update_freq)
    smoothing = float(args.smoothing)
    clip_grad = args.clip_grad
    use_ema = bool(args.model_ema)
    ema_warmup = bool(getattr(args, "model_ema_warmup", False))
    use_hessian = needs_hessian(getattr(args, "opt", ""))
    lr_schedule = jnp.asarray(lr_schedule, jnp.float32)
    wd_schedule = jnp.asarray(wd_schedule, jnp.float32)
    # under --layer_decay the per-group effective LRs span
    # [lr*min_scale, lr*max_scale]; the reference reports the min/max over
    # param groups each step (engine.py:101-117)
    lr_scale_min = float(lr_scale_bounds[0])
    lr_scale_max = float(lr_scale_bounds[1])
    has_dropout_like = True  # all models accept a dropout rng

    # ---- knowledge distillation (beyond reference: its README todo #5) ----
    # teacher = (model, params, batch_stats) runs an eval-mode forward on the
    # SAME mixed batch inside the step (stop-gradient); the soft-label KL term
    # (Hinton KD, tau^2-scaled) blends with the base criterion by alpha.
    distill_alpha = float(getattr(args, "distillation_alpha", 0.0) or 0.0)
    distill_tau = float(getattr(args, "distillation_tau", 1.0) or 1.0)
    distill = teacher is not None and distill_alpha > 0.0

    def _teacher_logits(images):
        t_model, t_params, t_stats = teacher
        variables = {"params": t_params}
        if t_stats:
            variables["batch_stats"] = t_stats
        return jax.lax.stop_gradient(
            t_model.apply(variables, images, train=False).astype(jnp.float32)
        )

    def loss_fn(params, batch_stats, images, targets, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            logits, mutated = model.apply(
                variables, images, train=True,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            logits = model.apply(
                variables, images, train=True, rngs={"dropout": dropout_rng}
            )
            new_stats = batch_stats
        if targets.ndim == 2:  # soft targets (mixup) — SoftTargetCE
            loss = -jnp.mean(
                jnp.sum(targets * jax.nn.log_softmax(logits.astype(jnp.float32)), -1)
            )
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), targets
            ).mean()
        if distill:
            s = logits.astype(jnp.float32) / distill_tau
            t = _teacher_logits(images) / distill_tau
            kd = jnp.mean(
                jnp.sum(
                    jax.nn.softmax(t) * (jax.nn.log_softmax(t)
                                         - jax.nn.log_softmax(s)),
                    axis=-1,
                )
            ) * (distill_tau ** 2)
            loss = (1.0 - distill_alpha) * loss + distill_alpha * kd
        return loss, (new_stats, logits)

    if getattr(args, "remat", False):
        # rematerialize the forward during backward — activations are not
        # kept, trading ~1 extra forward for O(depth) less HBM (SURVEY
        # 'HBM bandwidth' guidance; lets ViT-L/ConvNeXt-XL take larger
        # per-chip batches)
        loss_fn = jax.checkpoint(loss_fn)

    def train_step(state: TrainState, batch, rng):
        step = state.step
        rng = jax.random.fold_in(rng, step)
        k_aug, k_mix, k_drop, k_drop2 = jax.random.split(rng, 4)

        images = augment(batch["image"], k_aug)
        labels = batch["label"]

        if mixup_cfg is not None:
            mixed, targets = mixup_cutmix(images, labels, k_mix, mixup_cfg)
        elif smoothing > 0:
            mixed = images
            targets = one_hot_smooth(labels, num_classes, smoothing)
        else:
            mixed = images
            targets = labels

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, mixed, targets, k_drop)

        def hutchinson_diag():
            # AdaHessian Hutchinson estimate: z ⊙ (Hz) with Rademacher z,
            # Hz from one jvp through the grad function (a second fwd+bwd —
            # the same cost profile as torch adahessian's double backward).
            # Called inside the update branch only, so with update_freq>1
            # the non-boundary microsteps never pay for it.
            k_hess = jax.random.fold_in(rng, 0x5E55)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            zkeys = jax.random.split(k_hess, len(leaves))
            z = treedef.unflatten([
                jax.random.rademacher(k, l.shape, jnp.float32).astype(l.dtype)
                for k, l in zip(zkeys, leaves)
            ])

            def grad_only(p):
                return jax.grad(
                    lambda q: loss_fn(q, state.batch_stats, mixed, targets,
                                      k_drop)[0]
                )(p)

            hvp = jax.jvp(grad_only, (state.params,), (z,))[1]
            return jax.tree.map(lambda a, b: a * b, z, hvp)

        finite = jnp.isfinite(loss)
        inv_freq = 1.0 / update_freq
        if update_freq > 1:
            # zero non-finite micro-grads so they never enter the accumulator
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g * inv_freq, jnp.zeros_like(g)),
                grads,
            )
        # else: leave grads untouched — the branchless select below discards
        # the whole (params, opt_state) update on a non-finite step, so the
        # extra full pass over the gradients here would buy nothing
        # (~0.7 ms/step on v5e; the grad_norm metric is zeroed by a scalar
        # select instead)
        # BN stats only advance on finite steps
        new_stats = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_stats, state.batch_stats
        )

        if update_freq > 1:
            # the non-finite micro-grad was zeroed above, so a bad microstep
            # contributes nothing while the window's earlier finite
            # micro-grads are KEPT (wiping the accumulator here would make
            # the boundary update apply a partial, mis-scaled gradient)
            accum = jax.tree.map(lambda a, g: a + g, state.grad_accum, grads)
            boundary = (step + 1) % update_freq == 0
        else:
            accum = grads
            boundary = jnp.asarray(True)

        it = jnp.clip(step // update_freq, 0, lr_schedule.shape[0] - 1)
        lr = lr_schedule[it]
        wd = wd_schedule[it]
        opt_state = set_hyperparams(state.opt_state, lr, wd)

        # skipped steps report grad_norm 0 (grads are zeroed-or-discarded)
        grad_norm = jnp.where(
            finite,
            _global_norm(accum, getattr(args, "grad_norm_type", 2.0)),
            0.0,
        )
        do_update = boundary & finite

        def apply_fn(operand):
            params, opt_state, accum, ema, ema_bs = operand
            if use_hessian:
                updates, new_opt = tx.update(
                    accum, opt_state, params, hessian_diag=hutchinson_diag()
                )
            else:
                updates, new_opt = tx.update(accum, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if prune_masks is not None:
                # sparse fine-tune (--prune_mask): re-zero pruned weights
                # after the update, BEFORE the EMA sees them. Ineligible
                # leaves carry a scalar True mask, which XLA folds away;
                # eligible leaves get a fused elementwise select.
                new_params = jax.tree.map(
                    lambda p, m: jnp.where(m, p, jnp.zeros_like(p)),
                    new_params, prune_masks,
                )
            if use_ema:
                # timm ModelEmaV3 EMAs the full state_dict — params AND BN
                # running statistics (train.py:201 + timm semantics). With
                # --model_ema_warmup the decay ramps in over the first real
                # updates (ModelEmaV3 use_warmup), eliminating init-weight
                # contamination on short-horizon runs.
                d_eff = (warmup_decay(ema_decay, step // update_freq)
                         if ema_warmup else ema_decay)
                ema = ema_update(ema, new_params, d_eff)
                if ema_bs is not None:
                    ema_bs = ema_update(ema_bs, new_stats, d_eff)
            return (new_params, new_opt,
                    jax.tree.map(jnp.zeros_like, accum), ema, ema_bs)

        def skip_fn(operand):
            return operand

        operand = (state.params, opt_state, accum, state.ema_params,
                   state.ema_batch_stats)
        if update_freq > 1:
            # Accumulation: the optimizer must only run at real update
            # boundaries, so the branch is a genuine lax.cond.
            new_params, new_opt, new_accum, new_ema, new_ema_bs = jax.lax.cond(
                do_update, apply_fn, skip_fn, operand
            )
            # every window ends at its boundary: when the boundary microstep
            # was non-finite (update skipped via skip_fn), discard the
            # accumulated window so the next one starts clean
            new_accum = jax.tree.map(
                lambda a: jnp.where(boundary, jnp.zeros_like(a), a), new_accum
            )
        else:
            # update_freq==1: do_update is only False on a non-finite loss, so
            # run the update unconditionally and select per leaf. A lax.cond
            # here costs ~1 ms of `conditional` dispatch plus ~2 ms of operand
            # copies per step on v5e (see benchmarks/trace_ops_resnet50.json:
            # copy-done ×964/step) — the branchless selects over params/m/v
            # are ~3x cheaper. NOTE: at update_freq==1 grads are NOT zeroed
            # on a non-finite loss (that pass is skipped above) — these
            # selects are the SOLE gate keeping NaNs out of params/
            # opt_state/EMA; do not reuse `accum` as if it were sanitized.
            applied = apply_fn(operand)
            sel = lambda n, o: jnp.where(do_update, n, o)
            (new_params, new_opt, new_accum, new_ema, new_ema_bs) = (
                jax.tree.map(sel, applied, operand)
            )

        # ---- metrics (device side, reference engine.py:82-97) ----
        if mixup_cfg is not None and getattr(args, "train_acc_mode", "exact") == "mixed":
            # free approximation: mixed-batch logits vs hard labels
            acc_logits = logits
        elif mixup_cfg is not None:
            # second forward on the un-mixed (but augmented) batch; BN uses
            # batch statistics (torch train-mode forward) but stats are
            # discarded. Runs on POST-update weights: the reference computes
            # this after optimizer.step() + EMA update (engine.py:71-91), so
            # the reported train accuracy reflects the step's new parameters.
            variables = {"params": new_params}
            if state.batch_stats:
                variables["batch_stats"] = new_stats
                acc_logits, _ = model.apply(
                    variables, images, train=True,
                    rngs={"dropout": k_drop2}, mutable=["batch_stats"],
                )
            else:
                acc_logits = model.apply(
                    variables, images, train=True, rngs={"dropout": k_drop2}
                )
        else:
            acc_logits = logits
        preds = jnp.argmax(acc_logits, axis=-1)
        class_acc = jnp.mean((preds == labels).astype(jnp.float32))
        tp, fp, fn = _per_class_counts(preds, labels, num_classes)

        metrics = {
            "loss": loss,
            "class_acc": class_acc,
            "grad_norm": grad_norm,
            "lr": lr * lr_scale_max,
            "min_lr": lr * lr_scale_min,
            "weight_decay": wd,
            "tp": tp,
            "fp": fp,
            "fn": fn,
            "skipped": (~finite).astype(jnp.float32),
        }
        new_state = state.replace(
            step=step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
            grad_accum=new_accum if update_freq > 1 else None,
        )
        return new_state, metrics

    return train_step


def build_eval_step(model, num_classes: int) -> Callable:
    """Returns eval_step(params, batch_stats, batch) -> metric sums.

    Plain-CE loss regardless of train-time criterion (reference engine.py:147).
    The padded tail of the last batch (label == -1, data/sampler.eval_batches)
    is masked out of every statistic."""

    def eval_step(params, batch_stats, batch):
        images = eval_preprocess(batch["image"])
        labels = batch["label"]
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, images, train=False).astype(jnp.float32)

        valid = (labels >= 0)
        safe_labels = jnp.maximum(labels, 0)
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
        w = valid.astype(jnp.float32)

        preds = jnp.argmax(logits, axis=-1)
        top1 = ((preds == safe_labels) & valid).astype(jnp.float32)
        k = min(5, logits.shape[-1])
        topk = jax.lax.top_k(logits, k)[1]
        top5 = (jnp.any(topk == safe_labels[:, None], axis=-1) & valid).astype(
            jnp.float32
        )
        tp, fp, fn = _per_class_counts(preds, safe_labels, num_classes, weights=w)
        return {
            "loss_sum": jnp.sum(losses * w),
            "n": jnp.sum(w),
            "top1_sum": jnp.sum(top1),
            "top5_sum": jnp.sum(top5),
            "tp": tp,
            "fp": fp,
            "fn": fn,
        }

    return eval_step
