"""jax.profiler integration (XProf/Perfetto traces).

The reference has no profiling at all (SURVEY.md §5.1-5.2: TensorBoard
scalars only).  Here any training run can capture a device trace of a
window of steps for kernel-level analysis:

    python main.py ... --profile_steps 20     # trace steps 5..25
    # trace lands in <exp_path>/profile, open with XProf/TensorBoard
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


class StepProfiler:
    """Traces a [start, start+steps) window of training steps."""

    def __init__(self, logdir: Optional[str], steps: int = 0,
                 start_step: int = 5):
        self.logdir = logdir
        self.steps = steps
        self.start = start_step
        self._active = False
        self._done = steps <= 0 or not logdir

    def observe(self, step: int) -> None:
        if self._done:
            return
        if not self._active and step >= self.start:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and step >= self.start + self.steps:
            self.stop()

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
