"""Profiling and tracing shims.

Equivalents of the reference's two mechanisms (SURVEY.md §5):
``measure`` mirrors the os_signpost interval wrapper
(/root/reference Sources/SIFTMetal/Utilities/Performance.swift:10-20,
used around each pipeline phase at SIFT.swift:155-226) on top of
``jax.profiler.TraceAnnotation`` + wall clocks; ``capture`` mirrors the
programmatic Metal GPU frame capture
(Utilities/MetalExtensions.swift:11-23) on top of ``jax.profiler.trace``
(XProf/Perfetto traces instead of .gputrace files).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger("siftmetal_tpu.perf")

_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def measure(name: str, log: bool = False) -> Iterator[None]:
    """Wall-clock + profiler-annotated interval around a pipeline phase."""
    import jax

    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - start
    _totals[name] += dt
    _counts[name] += 1
    if log:
        logger.info("%s: %.3f ms", name, dt * 1e3)


def timings() -> Dict[str, Dict[str, float]]:
    """Accumulated {name: {total_s, count, mean_ms}} since reset."""
    return {
        k: {
            "total_s": _totals[k],
            "count": _counts[k],
            "mean_ms": 1e3 * _totals[k] / max(_counts[k], 1),
        }
        for k in _totals
    }


def reset_timings() -> None:
    _totals.clear()
    _counts.clear()


@contextlib.contextmanager
def capture(
    trace_dir: str, enabled: bool = True
) -> Iterator[None]:
    """Device-level trace capture (view with XProf / Perfetto).

    Like the reference's ``capture(commandQueue:capture:worker:)``, a
    disabled capture runs the body with zero overhead."""
    import jax

    if not enabled:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield
