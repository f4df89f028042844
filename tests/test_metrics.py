"""SmoothedValue / MetricLogger (reference utils.py:65-204)."""

import numpy as np

from imageclassification_tpu.utils.metrics import MetricLogger, SmoothedValue


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4, 5]:
        v.update(x)
    assert v.value == 5
    assert v.avg == 4.0            # window = [3,4,5]
    assert v.median == 4.0
    assert v.global_avg == 3.0     # all 5 values
    assert v.max == 5
    assert "4.0" in str(v)


def test_smoothed_value_weighted_count():
    v = SmoothedValue()
    v.update(2.0, n=10)
    v.update(4.0, n=30)
    assert abs(v.global_avg - 3.5) < 1e-9


def test_metric_logger_attr_access_and_str():
    m = MetricLogger(delimiter="  ")
    m.update(loss=0.5, acc=0.9)
    m.update(loss=0.7)
    assert abs(m.loss.global_avg - 0.6) < 1e-9
    assert "loss:" in str(m) and "acc:" in str(m)
    try:
        m.nonexistent
        assert False
    except AttributeError:
        pass


def test_log_every_iterates_all():
    m = MetricLogger()
    items = list(m.log_every(range(7), print_freq=3, header="t:"))
    assert items == list(range(7))
