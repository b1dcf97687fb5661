"""Device/tunnel workarounds.

On the axon-tunneled TPU used in this environment, the *first*
device-to-host readback in a process pays a large one-time channel
initialization cost (observed 50-400 s; independent of transfer size —
subsequent readbacks run at normal bandwidth).  :func:`warm_readback_channel`
triggers that initialization on a daemon thread so it overlaps host-side
work instead of serializing into the first real result fetch.
"""

from __future__ import annotations

import logging
import threading
import time

_started = False
_done = threading.Event()
_init_seconds: float | None = None


def warm_readback_channel() -> threading.Event:
    """Start (once) a background thread that performs a tiny device
    round-trip; returns an Event set when the readback channel is live."""
    global _started
    if _started:
        return _done
    _started = True

    def _warm():
        global _init_seconds
        t0 = time.perf_counter()
        try:
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jnp.zeros((8,)) + 1.0)
        except Exception:
            pass
        finally:
            _init_seconds = time.perf_counter() - t0
            # Attributable in benchmarks: this is a tunnel artifact (the
            # first d2h readback of a process), not product compute.
            logging.info(
                "d2h readback channel live after %.1fs", _init_seconds
            )
            _done.set()

    threading.Thread(target=_warm, daemon=True, name="wcx-warm-d2h").start()
    return _done


def channel_init_seconds() -> float | None:
    """Duration of the one-time readback-channel init, once known."""
    return _init_seconds
