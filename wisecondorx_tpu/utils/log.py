"""Logging + per-stage timing.

The reference only has stdlib logging with a fixed format (main.py:492-496)
and no timing; we keep the same format for log-parity and add a stage timer
(SURVEY.md section 5 asks the rebuild to add per-stage timing hooks).
"""

from __future__ import annotations

import contextlib
import logging
import time

LOG_FORMAT = "[%(levelname)s - %(asctime)s]: %(message)s"
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


def setup_logging(loglevel: str = "INFO") -> None:
    logging.basicConfig(
        format=LOG_FORMAT,
        datefmt=DATE_FORMAT,
        level=getattr(logging, loglevel.upper(), logging.INFO),
    )


_STAGE_TIMES: dict[str, float] = {}


@contextlib.contextmanager
def stage_timer(name: str):
    """Context manager logging and recording wall-clock of a pipeline stage."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        _STAGE_TIMES[name] = _STAGE_TIMES.get(name, 0.0) + elapsed
        logging.info("[timing] %s: %.3fs", name, elapsed)


def stage_times() -> dict[str, float]:
    """Accumulated per-stage wall-clock seconds (for bench harness)."""
    return dict(_STAGE_TIMES)


def reset_stage_times() -> None:
    _STAGE_TIMES.clear()
