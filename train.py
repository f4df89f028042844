"""Training / evaluation CLI (reference L8: train.py:110-417), TPU-native.

Same flags, same artifacts (class_indices.json, checkpoint-{N,best,best-ema}.pth,
train_cls/log.txt JSON lines, TensorBoard/W&B scalars), same epoch flow —
but the hot path is one jit-compiled step over a device mesh: on-device
augmentation + mixup + forward/backward + optimizer + EMA + metrics fused
(see imageclassification_tpu/engine/step.py).

Usage:
    python train.py --data_path /path/to/folder --model resnet50 ...
Multi-host TPU pods: run one process per host (jax.distributed auto-init).
"""

from __future__ import annotations

import datetime
import json
import os
import signal
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from imageclassification_tpu import checkpoint as ckpt_io
from imageclassification_tpu import parallel
from imageclassification_tpu.config import TrainConfig, parse_args
from imageclassification_tpu.data.folder import build_dataset
from imageclassification_tpu.data.loader import DeviceLoader
from imageclassification_tpu.data.mixup import build_mixup
from imageclassification_tpu.data.sampler import (
    epoch_batch_indices,
    eval_batches,
    ra_epoch_batch_indices,
)
from imageclassification_tpu.engine.loop import evaluate, train_one_epoch
from imageclassification_tpu.engine.state import create_train_state, num_params
from imageclassification_tpu.engine.step import build_eval_step, build_train_step
from imageclassification_tpu.models import create_model, model_kwargs_for
from imageclassification_tpu.optim.factory import create_optimizer
from imageclassification_tpu.optim.layer_decay import layer_decay_scales
from imageclassification_tpu.optim.schedules import build_schedules
from imageclassification_tpu.utils.loggers import TensorboardLogger, WandbLogger


def _enable_compile_cache():
    """Persistent XLA compilation cache — first-run step compiles (~1-2 min on
    a tunneled chip) amortize to ~0 on subsequent runs."""
    cache_dir = os.environ.get(
        "IMGCLS_COMPILE_CACHE", os.path.expanduser("~/.cache/imgcls_tpu_xla")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(args: TrainConfig):
    # pin the platform BEFORE anything can initialize a backend —
    # init_distributed_mode may touch devices on multi-process bootstrap
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.check_nans:
        jax.config.update("jax_debug_nans", True)  # SURVEY §5.2 equivalent

    parallel.init_distributed_mode(args)
    print(args)
    _enable_compile_cache()

    # per-process seeding (reference train.py:116-119 seeds per rank; here the
    # split/sampler seeds must agree across processes, so the DATA seed is the
    # global one and only augmentation keys fold in the process index)
    # NB: under SPMD the jit step must receive the SAME key on every process
    # (per-sample aug keys are derived from the global batch inside the step);
    # host-side decode randomness is what varies per rank.
    seed = args.seed
    base_rng = jax.random.key(seed)

    dataset_train, dataset_val, num_classes = build_dataset(args)

    num_tasks = parallel.get_world_size()
    global_rank = parallel.get_rank()

    mesh = parallel.make_mesh(args.mesh_shape)
    print(f"Mesh: {mesh}")

    if global_rank == 0:
        os.makedirs(args.log_dir, exist_ok=True)
        log_writer = TensorboardLogger(log_dir=args.log_dir)
    else:
        log_writer = None
    if global_rank == 0 and args.enable_wandb:
        wandb_logger = WandbLogger(args)
    else:
        wandb_logger = None

    total_batch_size = args.batch_size * args.update_freq * num_tasks
    num_training_steps_per_epoch = len(dataset_train) // total_batch_size
    if num_training_steps_per_epoch == 0:
        raise ValueError(
            f"dataset ({len(dataset_train)}) smaller than one global batch "
            f"({total_batch_size}); lower --batch_size"
        )

    input_shape = [1, args.input_size, args.input_size, 3]  # NHWC

    mixup_cfg = build_mixup(args, num_classes)
    if mixup_cfg is not None:
        print("Mixup is activated!")

    model_kwargs = model_kwargs_for(args, num_classes)
    model = create_model(
        args.model,
        half_precision=(args.use_amp or args.half_precision),
        **model_kwargs,
    )
    model_spec = {"name": args.model, "kwargs": {
        k: v for k, v in model_kwargs.items() if k != "pretrained"
    }}

    print("LR = %.8f" % args.lr)
    print("Batch size = %d" % total_batch_size)
    print("Update frequent = %d" % args.update_freq)
    print("Number of training examples = %d" % len(dataset_train))
    print("Number of training steps per epoch = %d" % num_training_steps_per_epoch)

    # ---- init state ----
    lr_scale_bounds = [1.0, 1.0]  # [min, max] over layer-decay groups

    def build_tx(params):
        scales = None
        if args.layer_decay and args.layer_decay < 1.0:
            scales = layer_decay_scales(params, args.model, args.layer_decay)
            leaves = jax.tree_util.tree_leaves(scales)
            lr_scale_bounds[0] = float(min(float(s) for s in leaves))
            lr_scale_bounds[1] = float(max(float(s) for s in leaves))
        return create_optimizer(
            opt=args.opt,
            lr=args.lr,
            weight_decay=args.weight_decay,
            opt_eps=args.opt_eps,
            opt_betas=args.opt_betas,
            clip_grad=args.clip_grad,
            layer_scales=scales,
        )

    init_rng = jax.random.key(seed)
    # init once on host to learn the param tree, then build tx and re-init state
    variables_shape = jax.eval_shape(
        lambda: model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.zeros(input_shape, jnp.float32),
            train=False,
        )
    )
    tx = build_tx(variables_shape["params"])

    state = create_train_state(
        model, tx, init_rng, input_shape,
        use_ema=args.model_ema, update_freq=args.update_freq,
    )
    print("number of params:", num_params(state))

    print("Use Cosine LR scheduler")
    lr_schedule_values, wd_schedule_values = build_schedules(
        args, num_training_steps_per_epoch
    )
    print(
        "Max WD = %.7f, Min WD = %.7f"
        % (max(wd_schedule_values), min(wd_schedule_values))
    )

    # pretrained local weights (no-egress replacement for timm hub downloads;
    # the reference fetches through timm at train.py:194 — here a raw torch
    # state_dict is accepted too, converted on the fly)
    if args.pretrained and args.pretrained_path:
        from imageclassification_tpu.checkpoint.torch_convert import (
            load_pretrained_flat,
            resample_pos_embed,
        )
        ck = load_pretrained_flat(args.pretrained_path, args.model)
        src_flat = ck["model"]
        if "pos_embed" in state.params:  # works for dict and FrozenDict
            # ViT at a non-source --input_size: bicubic-resample the position
            # grid like timm does for pretrained hub weights, instead of
            # letting the shape-mismatch pruning drop it
            src_flat = resample_pos_embed(
                src_flat, {"pos_embed": state.params["pos_embed"]}
            )
        new_params, _ = ckpt_io.load_params_with_pruning(state.params, src_flat)
        state = state.replace(params=new_params)
        if ck.get("batch_stats") and state.batch_stats:
            new_stats, _ = ckpt_io.load_params_with_pruning(
                state.batch_stats, ck["batch_stats"], verbose=False
            )
            state = state.replace(batch_stats=new_stats)
        if state.ema_params is not None:
            # timm ModelEmaV3 deep-copies the model AFTER pretrained weights
            # are loaded — reseed the EMA so it tracks the fine-tune start
            # point, not the random init (real copy: aliasing would break
            # train-state donation)
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params)
            )
            if state.ema_batch_stats is not None:
                state = state.replace(
                    ema_batch_stats=jax.tree.map(jnp.copy, state.batch_stats)
                )
        print(f"Loaded pretrained weights from {args.pretrained_path}")
    elif (args.pretrained and not args.pretrained_path and not args.resume
          and not (args.auto_resume
                   and ckpt_io.find_latest_checkpoint(args.output_dir))):
        # the reference downloads hub weights here (timm, train.py:194); TPU
        # pods are zero-egress, so the default invocation proceeds FROM
        # SCRATCH with a loud warning instead of aborting — the reference's
        # default `python train.py --data_path <dir>` must train
        # (PARITY.md "Known deviations").
        print(
            "WARNING: --pretrained true but no local weights available "
            "(no network egress on TPU pods) — TRAINING FROM SCRATCH. "
            "Pass --pretrained_path (a repo checkpoint, or a torch/timm "
            "state_dict converted via "
            "imageclassification_tpu/checkpoint/torch_convert.py) to "
            "fine-tune from pretrained weights.",
            flush=True,
        )

    state, _ = ckpt_io.auto_load_model(args, state)

    prune_masks = None
    if args.prune_mask:
        # sparse fine-tune: freeze the loaded checkpoint's zero pattern (from
        # modelchange.py --mode prune) — weights are re-masked after every
        # optimizer update so sparsity survives fine-tuning
        prune_masks, mask_sparsity = ckpt_io.derive_prune_masks(state.params)
        print(f"Prune-mask fine-tune: enforcing {mask_sparsity:.3f} sparsity "
              "zero pattern through training")

    # place on mesh: params replicated (or FSDP/ZeRO sharded), rest follows
    state = parallel.shard_params(mesh, state, fsdp=args.fsdp)

    teacher = None
    if args.teacher_path and args.distillation_alpha > 0:
        # teacher rebuilt from its checkpoint's own model_spec (same UX as
        # val.py); eval-mode forward runs inside the jit step, stop-gradient
        from val import initialize_model as init_teacher

        # dequantize=True: _teacher_logits runs a plain model.apply with no
        # int8 interceptor, so an int8-quantized teacher checkpoint must be
        # restored to float kernels here (raw -127..127 values would silently
        # corrupt the KD soft targets)
        t_model, t_params, t_stats, t_nc = init_teacher(
            args.teacher_path, model_ema=False,
            half_precision=(args.use_amp or args.half_precision),
            dequantize=True,
        )
        if t_nc != num_classes:
            raise ValueError(
                f"teacher has {t_nc} classes, dataset has {num_classes}"
            )
        teacher = (t_model, t_params, t_stats)
        print(
            f"Distillation: teacher={args.teacher_path} "
            f"alpha={args.distillation_alpha} tau={args.distillation_tau}"
        )

    train_step = jax.jit(
        build_train_step(
            model, tx, args, num_classes, mixup_cfg,
            lr_schedule_values, wd_schedule_values,
            ema_decay=args.model_ema_decay,
            lr_scale_bounds=tuple(lr_scale_bounds),
            teacher=teacher,
            prune_masks=prune_masks,
        ),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(build_eval_step(model, num_classes))

    n_dev = len(mesh.devices.flatten())
    if (args.batch_size * num_tasks) % n_dev != 0:
        raise ValueError(
            f"global batch {args.batch_size * num_tasks} must divide across "
            f"{n_dev} devices"
        )
    eval_bs = int(1.5 * args.batch_size)  # reference train.py:167 (per process)
    eval_bs = max(n_dev, (eval_bs // n_dev) * n_dev)

    def make_val_loader():
        # val set sharded across processes (disjoint slices) — each sample is
        # decoded and counted exactly once globally
        idx = np.stack(
            eval_batches(
                len(dataset_val), eval_bs, rank=global_rank, world=num_tasks
            )
        )
        return DeviceLoader(
            dataset_val, mesh, idx, args.input_size, train=False,
            seed=seed, num_workers=args.num_workers,
        )

    def ema_as_params(st):
        return st.ema_params if st.ema_params is not None else st.params

    def ema_as_stats(st):
        return st.ema_batch_stats if st.ema_batch_stats is not None else st.batch_stats

    if args.eval:
        print("Eval only mode")
        loader = make_val_loader()
        if args.model_ema:
            test_stats = evaluate(eval_step, ema_as_params(state),
                                  ema_as_stats(state), loader, num_classes)
        else:
            test_stats = evaluate(eval_step, state.params, state.batch_stats,
                                  loader, num_classes)
        print(
            f"Accuracy of the network on {len(dataset_val)} test images: "
            f"{test_stats['acc1']:.5f}%"
        )
        return

    max_accuracy = 0.0
    max_accuracy_ema = 0.0

    if args.profile_dir and global_rank == 0:
        try:
            jax.profiler.start_trace(args.profile_dir)
        except Exception as e:  # tunneled backends may not support tracing
            print(f"profiler unavailable: {e}")
            args = args.replace(profile_dir="")

    # graceful preemption (reference relies on submitit's requeue alone,
    # run_with_submitit.py:48-56; here SLURM's grace signal additionally
    # flushes a checkpoint so the requeued job loses at most one epoch even
    # when save_ckpt_freq > 1)
    preempted = {"flag": False}

    def _on_preempt(signum, frame):
        print(f"Received signal {signum}: checkpoint + stop after this epoch")
        preempted["flag"] = True

    for _sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            signal.signal(_sig, _on_preempt)
        except (ValueError, OSError):
            pass  # not the main thread / unsupported platform

    print("Start training for %d epochs" % args.epochs)
    start_time = time.time()
    for epoch in range(args.start_epoch, args.epochs):
        if args.RASampler:
            idx = ra_epoch_batch_indices(
                len(dataset_train), args.batch_size * num_tasks, epoch, seed,
                rank=global_rank, world=num_tasks,
            )
        else:
            idx = epoch_batch_indices(
                len(dataset_train), args.batch_size * num_tasks, epoch, seed,
                rank=global_rank, world=num_tasks,
            )
        # truncate to the step budget (drop_last semantics)
        idx = idx[: num_training_steps_per_epoch * args.update_freq]
        train_loader = DeviceLoader(
            dataset_train, mesh, idx, args.input_size, train=True,
            seed=seed + epoch, num_workers=args.num_workers,
        )
        if log_writer is not None:
            log_writer.set_step(epoch * num_training_steps_per_epoch * args.update_freq)
        if wandb_logger:
            wandb_logger.set_steps()

        state, train_stats = train_one_epoch(
            train_step, state, train_loader, epoch, base_rng, num_classes,
            num_training_steps_per_epoch, update_freq=args.update_freq,
            log_writer=log_writer, wandb_logger=wandb_logger,
            start_steps=epoch * num_training_steps_per_epoch,
        )

        saved_this_epoch = False
        if args.save_ckpt:
            if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
                ckpt_io.save_model(
                    args, input_shape, epoch, state, num_classes, model_spec
                )
                saved_this_epoch = True

        val_loader = make_val_loader()
        test_stats = evaluate(
            eval_step, state.params, state.batch_stats, val_loader, num_classes
        )
        print(
            f"Accuracy of the model on the {len(dataset_val)} test images: "
            f"{test_stats['acc1']:.3f}%"
        )
        if max_accuracy < test_stats["acc1"]:
            max_accuracy = test_stats["acc1"]
            if args.save_ckpt:
                ckpt_io.save_model(
                    args, input_shape, "best", state, num_classes, model_spec
                )
        print(f"Max accuracy: {max_accuracy:.3f}%")

        if log_writer is not None:
            log_writer.update(test_acc1=test_stats["acc1"], head="perf", step=epoch)
            log_writer.update(test_loss=test_stats["loss"], head="perf", step=epoch)

        log_stats = {
            "current_time": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            **{f"train_{k}": v for k, v in train_stats.items()},
            **{f"test_{k}": v for k, v in test_stats.items()},
            "epoch": epoch,
            "n_parameters": f"{num_params(state) / 1e6:.2f}M",
        }

        if args.model_ema:
            val_loader = make_val_loader()
            test_stats_ema = evaluate(
                eval_step, ema_as_params(state), ema_as_stats(state),
                val_loader, num_classes,
            )
            print(
                f"Accuracy of the model EMA on {len(dataset_val)} test images: "
                f"{test_stats_ema['acc1']:.1f}%"
            )
            if max_accuracy_ema < test_stats_ema["acc1"]:
                max_accuracy_ema = test_stats_ema["acc1"]
                if args.save_ckpt:
                    ckpt_io.save_model(
                        args, input_shape, "best-ema", state, num_classes,
                        model_spec,
                    )
                print(f"Max EMA accuracy: {max_accuracy_ema:.2f}%")
            if log_writer is not None:
                log_writer.update(
                    test_acc1_ema=test_stats_ema["acc1"], head="perf", step=epoch
                )
            log_stats.update({f"test_{k}_ema": v for k, v in test_stats_ema.items()})

        if parallel.is_main_process():
            if log_writer is not None:
                log_writer.flush()
            log_path = Path(args.output_dir).parent / "log.txt"
            with open(log_path, mode="a", encoding="utf-8") as f:
                f.write(json.dumps(log_stats) + "\n")

        if wandb_logger:
            wandb_logger.log_epoch_metrics(log_stats)

        # SLURM delivers the grace signal to each host with skew; the save
        # below runs collective gathers, so the DECISION must be identical on
        # every process — take the max of the per-host flags
        stop_now = parallel.any_process(preempted["flag"])
        if stop_now:
            if args.save_ckpt and not saved_this_epoch:
                ckpt_io.save_model(
                    args, input_shape, epoch, state, num_classes, model_spec
                )
            print(
                f"Preemption checkpoint at epoch {epoch}; exiting cleanly "
                "for requeue (auto_resume continues at epoch "
                f"{epoch + 1})"
            )
            break

    if args.profile_dir and global_rank == 0:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile_dir}")

    if wandb_logger and args.wandb_ckpt and args.save_ckpt:
        wandb_logger.log_checkpoints()

    ckpt_io.wait_for_pending_saves()
    total_time = time.time() - start_time
    total_time_str = str(datetime.timedelta(seconds=int(total_time)))
    print("Training time {}".format(total_time_str))


if __name__ == "__main__":
    args = parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
