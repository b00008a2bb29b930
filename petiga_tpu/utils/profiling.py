"""Tracing / profiling — the analog of the reference's PetscLog events
(petigareg.c:96-103 registers FormScalar/Vector/Matrix/System/Function/
Jacobian/IFunction/IJacobian events; petigapoint.c:463 counts flops).

``event(name)`` context-manager brackets a phase with a jax profiler
named scope (visible in TPU traces) and wall-clock accounting;
``log_view()`` prints a -log_view style table.  ``jax.profiler`` traces
can be captured around any region with ``trace(path)``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["event", "log_view", "reset", "trace", "EVENTS"]

EVENTS = defaultdict(lambda: {"count": 0, "time": 0.0, "flops": 0.0})


@contextlib.contextmanager
def event(name: str, flops: float = 0.0):
    """Bracket a phase (IGA_FormX event analog).  Wall time includes
    device sync only if the caller blocks; use block=True results for
    accurate accounting."""
    rec = EVENTS[name]
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield rec
    rec["count"] += 1
    rec["time"] += time.perf_counter() - t0
    rec["flops"] += flops


def reset():
    EVENTS.clear()


def log_view(file=None):
    """-log_view style summary table."""
    import sys

    f = file or sys.stdout
    f.write(f"{'Event':<24}{'Count':>8}{'Time (s)':>12}{'GF/s':>10}\n")
    for name, rec in sorted(EVENTS.items()):
        gfs = rec["flops"] / rec["time"] / 1e9 if rec["time"] > 0 else 0.0
        f.write(
            f"{name:<24}{rec['count']:>8}{rec['time']:>12.4f}{gfs:>10.2f}\n"
        )


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax/TPU profiler trace of the enclosed region
    (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
