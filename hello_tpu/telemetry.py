"""Stage timing and profiling utilities.

Replaces the reference's scattered accumulating timers
(PileupContainerLite.execTime, PileupDataTools.CANDIDATE_READER_TIME,
trainDataTools DATAGEN_TIME/TENSOR_TIME — reference python/*.py) with one
registry, plus a helper to capture JAX device profiles.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str):
    """Accumulate wall time for a named pipeline stage."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        with _lock:
            _totals[name] += elapsed
            _counts[name] += 1


def add(name: str, seconds: float, calls: int = 1):
    """Accumulate externally-measured time into a stage (e.g. timings that
    accrued in a worker/drainer thread's own dict)."""
    with _lock:
        _totals[name] += seconds
        _counts[name] += calls


def report() -> Dict[str, dict]:
    with _lock:
        return {name: {"seconds": round(_totals[name], 4),
                       "calls": _counts[name]}
                for name in sorted(_totals)}


def reset():
    with _lock:
        _totals.clear()
        _counts.clear()


def log_report(level=logging.INFO):
    for name, info in report().items():
        logger.log(level, "stage %-24s %8.3fs over %d calls",
                   name, info["seconds"], info["calls"])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace (viewable in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def tunnel_health(size_mb: float = 8.0, seed: int = 0) -> Dict[str, float]:
    """Fixed-size transfer probe of the CURRENT device-link phase:
    host->device MB/s, device->host MB/s, and small-transfer round-trip
    latency.

    Remote-TPU tunnels have multi-minute degraded phases (same-day >2x
    swings with identical code); publishing the probe next to a timing
    capture makes a degraded-phase number self-explaining instead of
    looking like a code regression.  Used by bench.py around its pipeline
    leg and by pipeline/soak.py around the call phase."""
    import statistics

    import jax
    import numpy as np

    n = int(size_mb * 1e6)
    # generate uint8 directly (an int64 intermediate would transiently
    # allocate 8x the probe and pay a cast before the timed transfer)
    arr = np.random.RandomState(seed).randint(0, 256, size=n, dtype=np.uint8)
    rtts = []
    for i in range(3):                     # 8 B round trips: pure latency
        t0 = time.perf_counter()
        small = jax.device_put(np.full(8, i, np.uint8))
        np.asarray(small)
        rtts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    up_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = np.asarray(d)
    down_s = time.perf_counter() - t0
    assert back[0] == arr[0]
    return {
        "probe_mb": size_mb,
        "up_mbps": round(size_mb / up_s, 1),
        "down_mbps": round(size_mb / down_s, 1),
        "rtt_ms": round(1e3 * statistics.median(rtts), 1),
    }
