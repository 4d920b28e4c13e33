"""Tracing / profiling helpers.

The reference's only observability is three couts and a printf kernel
(SURVEY §5).  TPU equivalent: jax.profiler traces plus named scopes around
the engine phases (flux / reciprocal / direct / chain rule) so per-phase
cost shows up in xprof/tensorboard, and a host-side step timer that respects
async dispatch.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def phase_scope(name: str):
    """Named scope visible in profiler traces (jax.named_scope)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block of work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Wall-clock timer that forces completion of a pytree of outputs.

    On tunneled/async backends block_until_ready may not wait for remote
    completion; fetching a scalar does.  Use:

        with step_timer() as t:
            out = step(...)
            t.sync(out)
        print(t.elapsed)
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, out):
        leaves = jax.tree.leaves(out)
        if leaves:
            float(jax.numpy.sum(leaves[0]))
        return out

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False
