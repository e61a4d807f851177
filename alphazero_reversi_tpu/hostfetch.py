"""Watchdog-guarded device->host fetches.

On this platform one indefinite ``jax.device_get`` hang (a silent futex
wait, no error) was observed in production at flagship iteration 300 after
~130 identical fetches had succeeded (PERF.md r3 "checkpoint critical
path"). The durable-checkpoint naming meant zero data loss, but the process
sat wedged until killed. This module converts that failure mode from "hang
until killed" to "fail fast + resume" (VERDICT r3 item 8): the pipeline's
critical host fetches run under a watchdog thread and raise
:class:`FetchTimeoutError` after ``timeout_s`` instead of blocking forever.

The reference has no analog (it is single-host torch with no remote device
relay); this is infrastructure the TPU deployment model requires.

Thread-safety note: the fetch runs on a daemon worker thread (jax host
fetches are thread-safe reads). On timeout the worker stays blocked in the
runtime — it cannot be cancelled — but the caller regains control, can save
state it already holds, and exit cleanly; the daemon thread dies with the
process.
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Any, Callable, Optional

import jax

_log = logging.getLogger(__name__)

# per-THREAD record of the most recent completed guarded fetch duration:
# the background checkpoint worker (pipeline.save_checkpoint) fetches
# concurrently with main-thread relabel/trajectory fetches, and a shared
# global would let one thread log the other's duration
_tls = threading.local()


def last_fetch_seconds() -> float:
    """Wall-clock seconds of the most recent guarded fetch COMPLETED ON
    THE CALLING THREAD (for surfacing fetch durations in metrics)."""
    return getattr(_tls, "last", 0.0)


class FetchTimeoutError(RuntimeError):
    """A guarded host fetch exceeded its watchdog timeout."""


def guarded(fn: Callable[[], Any], timeout_s: Optional[float],
            what: str = "host fetch") -> Any:
    """Run ``fn`` under a watchdog: raise :class:`FetchTimeoutError` if it
    has not returned within ``timeout_s`` seconds. ``timeout_s`` of None or
    <= 0 disables the watchdog (plain call). The completed duration is
    recorded per-thread (``last_fetch_seconds()``) and logged."""
    t0 = time.perf_counter()
    if not timeout_s or timeout_s <= 0:
        out = fn()
        _tls.last = time.perf_counter() - t0
        _log.debug("%s: %.2f s", what, _tls.last)
        return out

    box: dict = {}

    def run():
        try:
            box["value"] = fn()
        except BaseException as e:  # surfaced to the caller below
            box["error"] = e

    worker = threading.Thread(target=run, daemon=True,
                              name=f"hostfetch:{what}")
    worker.start()
    worker.join(timeout_s)
    if worker.is_alive():
        raise FetchTimeoutError(
            f"{what} exceeded the {timeout_s:.0f}s watchdog (relay hang? "
            "PERF.md r3) — state already on host is intact; resume from the "
            "last finalized checkpoint")
    if "error" in box:
        raise box["error"]
    _tls.last = time.perf_counter() - t0
    _log.debug("%s: %.2f s", what, _tls.last)
    return box["value"]


def device_get(tree: Any, timeout_s: Optional[float] = None,
               what: str = "host fetch") -> Any:
    """``jax.device_get`` (one parallel transfer burst) under the watchdog."""
    return guarded(lambda: jax.device_get(tree), timeout_s, what)
