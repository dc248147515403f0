"""Profiling hooks: named zones + chrome-trace output.

The reference threads SubmitProfileTiming callbacks through World and the
constraint solver (world.hpp:61,82-86) and ships a chrome-trace JSON writer
(tiny_chrome_trace_util.h). Here:

- :func:`profile_zone` wraps jax.profiler.TraceAnnotation (zones appear in
  TensorBoard/XProf device traces)
- :class:`ChromeTracer` is a lightweight host-side chrome://tracing writer
  for coarse phase timing (same file format as the reference's)
- :func:`trace_to` captures a full jax.profiler trace directory
"""

import contextlib
import json
import os
import threading
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_zone(name: str):
    """Named zone visible in JAX device profiles (B3_PROFILE analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ChromeTracer:
    """Host-side chrome://tracing JSON writer
    (TinyChromeUtilsStartTimings analog)."""

    def __init__(self):
        self.events = []
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def zone(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            end = time.perf_counter()
            with self._lock:
                self.events.append(
                    {
                        "name": name,
                        "ph": "X",
                        "ts": (start - self._t0) * 1e6,
                        "dur": (end - start) * 1e6,
                        "pid": os.getpid(),
                        "tid": threading.get_ident() % (1 << 31),
                    }
                )

    def write(self, path: str):
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)
