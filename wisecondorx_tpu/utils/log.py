"""Logging + per-stage timing + JAX profiler hooks.

The reference only has stdlib logging with a fixed format (main.py:492-496)
and no timing; we keep the same format for log-parity and add a stage timer
and device-trace capture (SURVEY.md section 5 asks the rebuild to add
per-stage timing + JAX profiler hooks).

Set ``WCX_PROFILE_DIR=/path`` to capture a TensorBoard-compatible device
trace of every timed stage (one trace directory per stage name); each
stage also runs under a ``jax.profiler.TraceAnnotation`` so its ops are
attributable inside larger traces.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

LOG_FORMAT = "[%(levelname)s - %(asctime)s]: %(message)s"
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


def setup_logging(loglevel: str = "INFO") -> None:
    logging.basicConfig(
        format=LOG_FORMAT,
        datefmt=DATE_FORMAT,
        level=getattr(logging, loglevel.upper(), logging.INFO),
    )


import threading

_STAGE_TIMES: dict[str, float] = {}
_TIMES_LOCK = threading.Lock()
#: Only one jax.profiler.trace may be active per process; pipelined
#: stages run concurrently on threads, so a stage that cannot take the
#: lock simply skips its device trace (the wall-clock is still recorded).
_TRACE_LOCK = threading.Lock()


@contextlib.contextmanager
def stage_timer(name: str):
    """Log + record a stage's wall-clock; optionally capture a device
    trace (WCX_PROFILE_DIR) and annotate the stage for the profiler."""
    profile_dir = os.environ.get("WCX_PROFILE_DIR")
    trace_cm = contextlib.nullcontext()
    annot_cm = contextlib.nullcontext()
    got_trace = False
    if profile_dir:
        import jax.profiler

        got_trace = _TRACE_LOCK.acquire(blocking=False)
        if got_trace:
            trace_cm = jax.profiler.trace(
                os.path.join(profile_dir, name.replace("/", "_"))
            )
        annot_cm = jax.profiler.TraceAnnotation(name)
    start = time.perf_counter()
    try:
        with trace_cm, annot_cm:
            yield
    finally:
        if got_trace:
            _TRACE_LOCK.release()
        elapsed = time.perf_counter() - start
        with _TIMES_LOCK:
            _STAGE_TIMES[name] = _STAGE_TIMES.get(name, 0.0) + elapsed
        logging.info("[timing] %s: %.3fs", name, elapsed)


def stage_times() -> dict[str, float]:
    """Accumulated per-stage wall-clock seconds (for bench harness)."""
    return dict(_STAGE_TIMES)


def reset_stage_times() -> None:
    _STAGE_TIMES.clear()
