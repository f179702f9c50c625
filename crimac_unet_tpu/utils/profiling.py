"""First-class profiling hooks (SURVEY.md §5: the reference had only
wall-clock prints; here jax.profiler traces + PhaseTimer are built in)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir=None, enabled=None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when
    enabled via argument or ``CRIMAC_PROFILE_DIR``."""
    import jax

    if log_dir is None:
        log_dir = os.environ.get("CRIMAC_PROFILE_DIR")
    if enabled is None:
        enabled = log_dir is not None
    if enabled and log_dir is None:
        raise ValueError(
            "device_trace(enabled=True) needs a destination: pass "
            "log_dir or set CRIMAC_PROFILE_DIR")
    if not enabled:
        yield None
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
