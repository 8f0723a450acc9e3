"""Profiling hooks for the device codec paths.

The reference has no tracing/profiling subsystem (SURVEY §5 — benchmarks
only); this module is the TPU-native equivalent: jax.profiler integration
for kernel-level traces plus a lightweight wall-clock stage recorder that
works on detached runtimes where the full trace viewer isn't available.

Usage:
    with zippy_tpu.profiling.trace("/tmp/zt_trace"):
        zippy_tpu.uncompress(blob, engine_name="device")
    # -> TensorBoard/XProf trace of every dispatch in the block.

    with zippy_tpu.profiling.stage_timer() as rec:
        zippy_tpu.uncompress(blob, engine_name="device")
    print(rec.report())

The native (host C++) codec has its own stage profiler: set ZT_PROF=1 and
per-stage wall times print to stderr (zippy_native.cpp deflate_shared).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """jax.profiler device trace around a block: every XLA dispatch the
    codec issues (tile decodes, encode groups, checksum folds) lands in a
    TensorBoard/XProf-readable trace under `logdir`."""
    import jax

    with jax.profiler.trace(logdir,
                            create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Label a region so its dispatches group under `name` in the trace
    (thin wrapper over jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageRecorder:
    """Wall-clock stage recorder for environments without a trace viewer
    (e.g. detached TPU runtimes): call mark() between stages; report()
    formats the deltas. Used by bench_device.py and available to users."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._marks: list[tuple[str, float]] = []

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        self._marks.append((name, now - self._t0))
        self._t0 = now

    def report(self) -> str:
        total = sum(dt for _, dt in self._marks)
        lines = [f"{name:20s} {dt * 1e3:9.3f} ms ({dt / total:5.1%})"
                 for name, dt in self._marks] if total else []
        lines.append(f"{'total':20s} {total * 1e3:9.3f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer():
    rec = StageRecorder()
    try:
        yield rec
    finally:
        rec.mark("(exit)")
