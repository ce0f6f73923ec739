"""Timers, device-memory observability, structured metrics.

Reference equivalents: ``Elapsed()`` wall-clock prints
(``utils.cpp:112-116``) and ``/proc/self/stat`` VM/RSS parsing
(``process_mem_usage``, ``utils.cpp:165-184``) sprinkled at every stage.
Here: a context-manager stage timer feeding a structured metrics dict
(JSON-serializable), host RSS via /proc, and device memory via
``device.memory_stats()``.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class Metrics:
    """Per-run structured metrics: stage timings + counters."""

    def __init__(self):
        self.data: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync()
        self.data[f"time_{name}_s"] = round(
            self.data.get(f"time_{name}_s", 0.0)
            + time.perf_counter() - t0, 6)

    def set(self, name: str, value):
        self.data[name] = value

    def dump(self, path: Optional[str] = None) -> str:
        blob = json.dumps(self.data, indent=2, sort_keys=True, default=str)
        if path:
            with open(path, "w") as f:
                f.write(blob)
        return blob


def host_mem_usage() -> Dict[str, float]:
    """VM/RSS in KB (reference ``process_mem_usage``,
    ``utils.cpp:165-184``)."""
    try:
        with open("/proc/self/statm") as f:
            vm_pages, rss_pages = (int(x) for x in f.read().split()[:2])
        page_kb = os.sysconf("SC_PAGE_SIZE") / 1024
        return {"vm_kb": vm_pages * page_kb, "rss_kb": rss_pages * page_kb}
    except OSError:
        return {"vm_kb": 0.0, "rss_kb": 0.0}


def device_mem_stats() -> Dict[str, Dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit") if k in s}
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper: captures a device trace viewable in
    TensorBoard/Perfetto (replaces the reference's gettimeofday pairs
    for kernel-level analysis)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
