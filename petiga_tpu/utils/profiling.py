"""Tracing / profiling — the analog of the reference's PetscLog events
(petigareg.c:96-103 registers FormScalar/Vector/Matrix/System/Function/
Jacobian/IFunction/IJacobian events; petigapoint.c:463 counts flops).

Two layers, matching how XLA splits trace time from run time:

* **Trace-time registration** — the assembly/solve drivers call
  :func:`annotate` inside their (traced) bodies: it opens a
  ``jax.named_scope`` (so the phase shows up named in TPU profiler
  traces) and records the event count and a *modeled* flop count in
  ``EVENTS``.  Counts are per trace (one per compilation), exactly like
  the reference's PetscLogFlops arithmetic models, which are also
  analytic counts rather than hardware counters.

* **Run-time timing** — :func:`timed` wraps a callable, blocks on the
  result, and accumulates wall time into the same event table, so
  ``log_view()`` after a run prints a ``-log_view``-style table with
  real seconds and modeled GF/s.  :func:`trace` captures a full
  jax/TPU profiler trace for xprof/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = [
    "annotate", "count", "event", "timed", "log_view", "reset", "trace",
    "EVENTS",
    "system_flops", "residual_flops", "jacobian_flops", "spmv_flops",
]

EVENTS = defaultdict(lambda: {"count": 0, "time": 0.0, "flops": 0.0})


# ------------------------------------------------------------ flop models
# Analytic per-call counts in the style of petigapoint.c:463 (the
# reference logs e.g. 2*nen*dof flops per IGAPointAddArray): quadrature
# loop of a bilinear form touches (nen*dof)^2 fused multiply-adds per
# point plus the basis contraction.

def system_flops(space, Q=None):
    Q = Q if Q is not None else int(
        __import__("numpy").prod([t.value.shape[1] for t in space.tabs])
    )
    n = space.nen * space.dof
    return 2.0 * space.nel * Q * (n * n + n)


def residual_flops(space, Q=None):
    Q = Q if Q is not None else int(
        __import__("numpy").prod([t.value.shape[1] for t in space.tabs])
    )
    n = space.nen * space.dof
    return 2.0 * space.nel * Q * n


def jacobian_flops(space, Q=None):
    # forward AD of the residual: one dual pass per element column
    return system_flops(space, Q)


def spmv_flops(stencil):
    return 2.0 * stencil.nnodes * stencil.K * stencil.dof * stencil.dof


# ------------------------------------------------------------- event layer

def count(name: str, flops: float = 0.0):
    """Register one occurrence of an event with its modeled flops
    (call at driver entry; pairs with jax.named_scope on the traced
    body so profiler traces carry the same names)."""
    rec = EVENTS[name]
    rec["count"] += 1
    rec["flops"] += flops
    return rec


@contextlib.contextmanager
def annotate(name: str, flops: float = 0.0):
    """Trace-time event bracket: named profiler scope + count/flop
    registration (IGA_FormX event analog, petigareg.c:96-103)."""
    rec = EVENTS[name]
    rec["count"] += 1
    rec["flops"] += flops
    with jax.named_scope(name):
        yield rec


@contextlib.contextmanager
def event(name: str, flops: float = 0.0):
    """Wall-clock event bracket (the caller is responsible for blocking
    on device results inside the bracket)."""
    rec = EVENTS[name]
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield rec
    rec["count"] += 1
    rec["time"] += time.perf_counter() - t0
    rec["flops"] += flops


def timed(name: str, fn, *args, flops: float = 0.0, **kw):
    """Call ``fn``, block on its outputs, and accumulate wall time +
    flops under ``name``.  Returns fn's result."""
    rec = EVENTS[name]
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kw))
    rec["count"] += 1
    rec["time"] += time.perf_counter() - t0
    rec["flops"] += flops
    return out


def reset():
    EVENTS.clear()


def log_view(file=None):
    """-log_view style summary table (src/petiga.c:218-223 IGAPrint
    pairs with PETSc's -log_view; here both live in one place)."""
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
