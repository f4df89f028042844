"""Host epoch loops around the jit steps (reference C11: engine.py:10-225).

The host loop only feeds batches and drains a small metrics pytree — one
device→host transfer per log interval, vs the reference's per-step `.item()` +
`cuda.synchronize()` (engine.py:54,79; flagged host-bound in SURVEY §3.2).
Metric fetching is deferred: we keep device metric handles and only block when
logging, letting the next step overlap with metric readback.
"""

from __future__ import annotations

import time
from typing import Iterable

import jax
import numpy as np

from ..utils.metrics import MetricLogger, per_class_precision_recall


def _progress():
    try:
        from rich.progress import Progress  # noqa

        return Progress()
    except ImportError:
        return None


def train_one_epoch(
    train_step,
    state,
    data_loader: Iterable,
    epoch: int,
    rng,
    num_classes: int,
    num_training_steps_per_epoch: int,
    update_freq: int = 1,
    log_writer=None,
    wandb_logger=None,
    start_steps: int = 0,
):
    """Run one epoch; returns (state, stats dict). Mirrors the reference's
    per-epoch reporting: rich progress bar (engine.py:24-28), per-step TB/wandb
    scalars (engine.py:112-132), per-class precision/recall printout
    (engine.py:138-141)."""
    metric_logger = MetricLogger(delimiter="  ")
    start_time = time.time()
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)

    progress = _progress()
    task = None
    if progress is not None:
        progress.start()
        task = progress.add_task(f"[green]Epoch {epoch} ", total=len(data_loader))

    pending = None  # (metrics handle, it) — fetched one step late
    for data_iter_step, batch in enumerate(data_loader):
        if progress is not None:
            progress.update(task, advance=1)
        step = data_iter_step // update_freq
        if step >= num_training_steps_per_epoch:
            continue
        it = start_steps + step

        state, metrics = train_step(state, batch, rng)

        if pending is not None:
            _drain(pending, metric_logger, tp, fp, fn, log_writer, wandb_logger)
        pending = (metrics, it)

    if pending is not None:
        _drain(pending, metric_logger, tp, fp, fn, log_writer, wandb_logger)
    if progress is not None:
        progress.stop()

    end_time = time.time()
    metric_logger.synchronize_between_processes()
    print(f"Averaged stats:{metric_logger},Time:{end_time - start_time}")
    precisions, recalls = per_class_precision_recall(tp, fp, fn)
    for i in range(num_classes):
        print(f"Class {i}: Precision: {precisions[i]:.5f}, "
              f"Recall: {recalls[i]:.5f}")

    stats = {k: meter.global_avg for k, meter in metric_logger.meters.items()}
    return state, stats


def _drain(pending, metric_logger, tp, fp, fn, log_writer, wandb_logger):
    metrics, it = pending
    m = jax.device_get(metrics)
    loss = float(m["loss"])
    class_acc = float(m["class_acc"])
    lr = float(m["lr"])  # max effective lr over groups (reference engine.py:114)
    min_lr = float(m.get("min_lr", m["lr"]))
    wd = float(m["weight_decay"])
    gn = float(m["grad_norm"])
    if m["skipped"] > 0:
        # skipped step: the non-finite loss (and the per-class counts
        # derived from NaN logits) must not poison the epoch averages —
        # one transient bad step would turn train_loss into NaN for the
        # whole epoch in log.txt/TB/wandb
        print(f"Loss is {loss}, skipping step")
        return
    tp += np.asarray(m["tp"])
    fp += np.asarray(m["fp"])
    fn += np.asarray(m["fn"])
    metric_logger.update(loss=loss, class_acc=class_acc)
    if log_writer is not None:
        log_writer.update(loss=loss, head="loss")
        log_writer.update(class_acc=class_acc, head="loss")
        log_writer.update(lr=lr, head="opt")
        log_writer.update(min_lr=min_lr, head="opt")
        log_writer.update(weight_decay=wd, head="opt")
        log_writer.update(grad_norm=gn, head="opt")
        log_writer.set_step()
    if wandb_logger:
        wandb_logger._wandb.log({
            "Rank-0 Batch Wise/train_loss": loss,
            "Rank-0 Batch Wise/train_max_lr": lr,
            "Rank-0 Batch Wise/train_min_lr": min_lr,
            "Rank-0 Batch Wise/train_class_acc": class_acc,
            "Rank-0 Batch Wise/train_grad_norm": gn,
            "Rank-0 Batch Wise/global_train_step": it,
        })


def evaluate(
    eval_step,
    params,
    batch_stats,
    data_loader: Iterable,
    num_classes: int,
    header: str = "Val:",
):
    """Full-val-set evaluation; returns the reference's stats dict shape
    (engine.py:145-225): loss, acc1, per-class precision_i/recall_i,
    avg_precision, avg_recall — computed from device-side count sums."""
    metric_logger = MetricLogger(delimiter="  ")
    totals = None
    for batch in metric_logger.log_every(data_loader, 0, header):
        out = eval_step(params, batch_stats, batch)
        out = jax.device_get(out)
        if totals is None:
            totals = {k: np.asarray(v, np.float64) for k, v in out.items()}
        else:
            for k, v in out.items():
                totals[k] += np.asarray(v, np.float64)
        bs = int(out["n"])
        if bs > 0:
            metric_logger.update(loss=float(out["loss_sum"]) / bs)
            metric_logger.meters["acc1"].update(
                100.0 * float(out["top1_sum"]) / bs, n=bs
            )

    metric_logger.synchronize_between_processes()

    n = max(totals["n"], 1.0)
    stats = {
        "loss": float(totals["loss_sum"] / n),
        "acc1": float(100.0 * totals["top1_sum"] / n),
        "acc5": float(100.0 * totals["top5_sum"] / n),
    }
    precisions, recalls = per_class_precision_recall(
        totals["tp"], totals["fp"], totals["fn"]
    )
    for i in range(num_classes):
        stats[f"precision_{i}"] = precisions[i]
        stats[f"recall_{i}"] = recalls[i]
        print(f"Class {i}: Precision: {precisions[i]:.5f}, "
              f"Recall: {recalls[i]:.5f}")
    stats["avg_precision"] = float(np.mean(precisions)) if precisions else 0.0
    stats["avg_recall"] = float(np.mean(recalls)) if recalls else 0.0
    print(
        f"Average Precision: {stats['avg_precision']:.5f}, "
        f"Average Recall: {stats['avg_recall']:.5f}"
    )
    return stats
