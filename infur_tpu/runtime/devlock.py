"""Process-wide device-access serialization for the interactive pipeline.

Measured on this environment's TPU relay (BENCH_NOTES.md): a host->device
FETCH (``np.asarray`` of a device array) that runs concurrently with
another thread's dispatches can starve indefinitely — the producer thread
keeps winning the transport and the fetch never completes (minimal repro:
a producer thread filling a bounded queue with tiny jitted results while
the main thread fetches one of them hangs forever).

The interactive pipeline is exactly that shape: the scheduler thread
dispatches device work per frame while a frontend thread fetches pixels.
``device_lock`` serializes the two: the scheduler holds it across a
generate (dispatch), frontends hold it across a fetch.  Throughput cost is
negligible for the interactive path (fetches are small); the batched
benchmark path is single-threaded on the device and does not need it.
"""

from __future__ import annotations

import threading

import numpy as np

device_lock = threading.RLock()


def fetch(arr) -> np.ndarray:
    """np.asarray(arr) under the device lock (safe against dispatch starvation)."""
    with device_lock:
        return np.asarray(arr)
