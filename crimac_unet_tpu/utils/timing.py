"""Device-program timing helpers.

One shared burst-timing primitive for bench.py and the measurement
scripts (three near-copies had grown — review finding r3).  The pattern:
dispatch ``burst`` calls back-to-back and synchronize ONCE, so the
per-dispatch tunnel round-trip (~30 ms through the axon TPU tunnel on
this rig) is amortized across the burst instead of being booked as
device time on every repetition.  ``jax.block_until_ready`` is used as
the fence by default; through the axon tunnel it can under-block, so
callers measuring sub-millisecond programs should pass ``sync`` that
forces a small d2h (e.g. ``lambda o: np.asarray(jnp.sum(o))``).
"""

from __future__ import annotations

import time


def burst_time(fn, *args, reps: int = 3, burst: int = 8, warmup: int = 1,
               sync=None):
    """Best per-call wall time of ``fn(*args)`` over ``reps`` bursts of
    ``burst`` back-to-back dispatches, synchronizing once per burst."""
    import jax

    if sync is None:
        sync = jax.block_until_ready
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(burst):
            out = fn(*args)
        sync(out)
        best = min(best, (time.time() - t0) / burst)
    return best
