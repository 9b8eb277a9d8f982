"""Running-average meters and profiling spans.

Reference: the AverageMeter pattern duplicated across every reference
script (newnet1.py:132-144 etc.) — note the published CVPR errata was
caused by logging ``.val`` instead of ``.avg`` (Readme.md:35-41); this
implementation makes the distinction explicit.  Profiling replaces the
ad-hoc ``time.time()`` spans (newnet1.py:919,1045-1056) with
``jax.profiler`` trace support plus wall-clock span timers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class AverageMeter:
    """Running average.  ``val`` is the LAST value; ``avg`` the mean."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class SpanTimer:
    """Named wall-clock spans with running averages.

    >>> spans = SpanTimer()
    >>> with spans("encode"): ...
    >>> spans.report()
    """

    def __init__(self):
        self.meters = defaultdict(AverageMeter)

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.meters[name].update(time.time() - t0)

    def report(self) -> str:
        return " | ".join(
            f"{k}: {m.avg * 1000:.1f}ms (n={m.count})"
            for k, m in self.meters.items())


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace around a block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
