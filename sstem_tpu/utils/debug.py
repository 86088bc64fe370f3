"""Debug/observability utilities (SURVEY §5.1-5.2 aux subsystems).

The reference has only wall-clock prints; here:
  * ``enable_nan_checks`` — jax debug_nans/debug_infs flags (the jit-pure
    replacement for torch-side NaN hunting)
  * ``profile_trace`` — context manager around jax.profiler.trace; emits a
    TensorBoard-loadable trace of device + host activity
  * ``step_timer`` — lightweight phase timer accumulating per-phase seconds
"""

import contextlib
import time
from collections import defaultdict

import jax


def enable_nan_checks(enable=True):
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


@contextlib.contextmanager
def profile_trace(logdir):
    """with profile_trace('/tmp/trace'): ... -> TensorBoard profile."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-phase wall time; ``report()`` like the reference's
    per-stage timers (sff_scripts_fusion/inference.py:194-201)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self):
        return {
            name: {"total_s": self.totals[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }
