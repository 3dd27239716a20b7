"""Meters (reference: torchreid/utils/avgmeter.py).

``TimeMeter`` replaces the reference's CUDA-event timing
(TorchTimeMeter, avgmeter.py:240-283) with host wall-clock around
blocked device work — on TPU the jitted step is dispatched
asynchronously, so timed sections must call ``block_until_ready`` on
their outputs for the numbers to mean anything (the engine does).
"""
import time
from collections import defaultdict

__all__ = ['AverageMeter', 'SingleMeter', 'EpochMeter', 'EpochArrayMeter',
           'LossEpochMetricsMeter', 'MetricsSummary', 'TimeMeter']


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsSummary:
    """Nested dict of AverageMeters keyed by (group, name).

    Device scalars (jax arrays) passed to ``update`` are buffered and
    converted to floats lazily at the next read (``summary_str``/
    ``avg``): the jitted train step runs asynchronously, so forcing a
    host readback of every loss term each batch would serialize the
    step pipeline. By drain time the values are long since computed —
    the conversion costs readback latency once per print/log event
    instead of once per step.
    """

    def __init__(self):
        self.meters = defaultdict(lambda: defaultdict(AverageMeter))
        self._pending = []

    # drain opportunistically past this depth: with print_freq<=0 and
    # no batch logging nothing else reads the meter during an epoch, so
    # the pending list (and its device buffers) would otherwise grow
    # unboundedly. 64 batches back the values are long since computed —
    # the readback is cheap and never blocks the step pipeline.
    _MAX_PENDING = 64

    def update(self, summary, n=1):
        self._pending.append((summary, n))
        if len(self._pending) >= self._MAX_PENDING:
            self._drain()

    def _drain(self):
        import numpy as np
        for summary, n in self._pending:
            for group, metrics in summary.items():
                for name, value in metrics.items():
                    v = np.asarray(value)
                    if v.ndim:
                        # a [k] per-step vector from a multi-step
                        # dispatch == k scalar updates of weight n
                        self.meters[group][name].update(
                            float(v.mean()), n * v.size)
                    else:
                        self.meters[group][name].update(value, n)
        self._pending.clear()

    def summary_str(self):
        self._drain()
        parts = []
        for group in self.meters:
            inner = ' '.join('{} {:.3f}'.format(k, m.avg)
                             for k, m in self.meters[group].items())
            parts.append('{}: [{}]'.format(group, inner))
        return ' | '.join(parts)

    def avg(self, group, name):
        self._drain()
        return self.meters[group][name].avg


class TimeMeter:
    def __init__(self, name=''):
        self.name = name
        self.meter = AverageMeter()
        self._start = None
        self.total = 0.0

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        if self._start is None:
            return
        dt = time.perf_counter() - self._start
        self.meter.update(dt)
        self.total += dt
        self._start = None

    @property
    def avg(self):
        return self.meter.avg


class SingleMeter:
    """Holds the latest value only (reference: avgmeter.py SingleMeter)."""

    def __init__(self):
        self.val = 0.0

    def update(self, val):
        self.val = float(val)


class EpochMeter:
    """Per-epoch list of scalar values; ``epoch_average`` summarizes
    (reference: avgmeter.py EpochMeter)."""

    def __init__(self):
        self.values = defaultdict(list)

    def update(self, val, epoch):
        self.values[int(epoch)].append(float(val))

    def epoch_average(self, epoch):
        vals = self.values.get(int(epoch), [])
        return sum(vals) / len(vals) if vals else 0.0

    def total_average(self):
        vals = [v for ep in self.values.values() for v in ep]
        return sum(vals) / len(vals) if vals else 0.0


class EpochArrayMeter:
    """Per-epoch list of fixed-size arrays, e.g. per-part statistics
    (reference: avgmeter.py EpochArrayMeter)."""

    def __init__(self, size):
        self.size = size
        self.values = defaultdict(list)

    def update(self, arr, epoch):
        import numpy as np
        arr = np.asarray(arr, dtype=float).reshape(-1)
        assert arr.size == self.size, (arr.size, self.size)
        self.values[int(epoch)].append(arr)

    def epoch_average(self, epoch):
        import numpy as np
        vals = self.values.get(int(epoch), [])
        return (np.stack(vals).mean(axis=0) if vals
                else np.zeros(self.size))


class LossEpochMetricsMeter:
    """loss-group -> metric-name -> EpochMeter tree
    (reference: avgmeter.py LossEpochMetricsMeter)."""

    def __init__(self):
        self.meters = defaultdict(lambda: defaultdict(EpochMeter))

    def update(self, summary, epoch):
        for group, metrics in summary.items():
            for name, value in metrics.items():
                self.meters[group][name].update(value, epoch)

    def epoch_average(self, epoch):
        return {group: {name: m.epoch_average(epoch)
                        for name, m in metrics.items()}
                for group, metrics in self.meters.items()}
