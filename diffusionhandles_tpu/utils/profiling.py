"""Tracing / profiling subsystem.

The reference has no profiling beyond tqdm bars (SURVEY.md section 5.1);
here per-phase wall-clock timers and jax.profiler traces are first-class:

    with phase_timer("guided_inference"):
        ...
    print(report())

    with device_trace("/tmp/trace"):   # open in TensorBoard / Perfetto
        run()
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str) -> Iterator[None]:
    """Accumulate wall clock under `name` (device-synchronized at exit if
    jax is loaded, so async dispatch doesn't hide work)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        try:
            import jax
            jax.effects_barrier()
        except Exception:
            pass
        dt = time.perf_counter() - start
        with _lock:
            _totals[name] += dt
            _counts[name] += 1


def report(reset: bool = False) -> str:
    with _lock:
        lines = ["phase                          total_s   calls   mean_s"]
        for name in sorted(_totals, key=lambda k: -_totals[k]):
            t, n = _totals[name], _counts[name]
            lines.append(f"{name:<30} {t:8.3f} {n:7d} {t / n:8.3f}")
        if reset:
            _totals.clear()
            _counts.clear()
    return "\n".join(lines)


def timings() -> Dict[str, float]:
    with _lock:
        return dict(_totals)


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (XLA ops, HBM, MXU utilization)
    viewable in TensorBoard's profile plugin or Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
