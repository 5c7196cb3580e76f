"""Tracing / profiling helpers.

The reference's observability is ad-hoc wall-clock timers written to
render_times.txt / train_times.txt plus CUDA events (SURVEY §5). TPU-native
equivalents:

  - ``StageTimer``: blocking wall-clock stage timers (block_until_ready to
    close async dispatch) with the same text-file sink convention;
  - ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
    trace directory when the runtime supports it.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Accumulates named stage timings; write() appends to a text file."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> str:
        lines = []
        for name, vals in self.times.items():
            lines.append(
                f"{name}: n={len(vals)} total={sum(vals):.3f}s "
                f"mean={sum(vals)/len(vals)*1000:.1f}ms"
            )
        return "\n".join(lines)

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(self.summary() + "\n")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace (view in TensorBoard); no-op if unsupported."""
    if log_dir is None:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
