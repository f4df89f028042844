"""Metrics core (reference C13: SmoothedValue + MetricLogger, utils.py:65-204).

Differences from the reference, by design:
  * device-side metrics (loss, acc, per-class TP/FP/FN) arrive already reduced
    across the data axis — the jit step computes them over the GLOBAL batch, so
    the per-meter NCCL all_reduce of utils.py:80-88 is only needed for host-side
    timing meters in multi-process runs;
  * cross-process sync uses jax.experimental.multihost_utils when process_count>1.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque

import jax
import numpy as np


class SmoothedValue:
    """Windowed deque + global total/count (reference utils.py:65-118)."""

    def __init__(self, window_size: int = 20, fmt: str | None = None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """all-reduce [count, total] across processes (reference utils.py:80-88)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(
            np.array([self.count, self.total], dtype=np.float64)
        )
        agg = np.sum(np.asarray(arr).reshape(-1, 2), axis=0)
        self.count = int(agg[0])
        self.total = float(agg[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


class MetricLogger:
    """Dict of meters with attr access + timed iteration (reference utils.py:121-204)."""

    def __init__(self, delimiter: str = "\t"):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            if hasattr(v, "item"):
                v = v.item()
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        if attr in self.__dict__:
            return self.__dict__[attr]
        raise AttributeError(f"'MetricLogger' object has no attribute '{attr}'")

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq, header=None):
        """Generator with iter/data timing, ETA, and periodic printing
        (reference utils.py:162-204; CUDA max-mem report replaced by TPU HBM
        peak when available)."""
        i = 0
        header = header or ""
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        total = len(iterable) if hasattr(iterable, "__len__") else None
        space_fmt = ":" + str(len(str(total))) + "d" if total else ""
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and (i % print_freq == 0 or (total and i == total - 1)):
                if total:
                    eta_seconds = iter_time.global_avg * (total - i)
                    eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
                    msg = self.delimiter.join(
                        [
                            header,
                            ("[{0" + space_fmt + "}/{1}]").format(i, total),
                            "eta: {}".format(eta_string),
                            str(self),
                            "time: {}".format(str(iter_time)),
                            "data: {}".format(str(data_time)),
                        ]
                    )
                else:
                    msg = self.delimiter.join([header, f"[{i}]", str(self)])
                print(msg)
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        total_time_str = str(datetime.timedelta(seconds=int(total_time)))
        if total:
            print(
                "{} Total time: {} ({:.4f} s / it)".format(
                    header, total_time_str, total_time / total
                )
            )


def per_class_precision_recall(tp, fp, fn):
    """Elementwise precision/recall with zero-denominator guards — the one
    computation behind the per-class printouts in engine/loop.py (train and
    eval) and val.py (each keeps its reference-parity print format)."""
    precision = [
        float(t) / (t + f) if t + f > 0 else 0.0 for t, f in zip(tp, fp)
    ]
    recall = [
        float(t) / (t + f) if t + f > 0 else 0.0 for t, f in zip(tp, fn)
    ]
    return precision, recall
