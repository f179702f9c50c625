"""Host->device transfer prefetching.

Overlaps the h2d copy of batch k+1 with device compute on batch k (the
reference's DataLoader only overlaps host-side work; device transfers were
synchronous ``.to(device)`` calls, pipeline.py:163-164).
"""

from __future__ import annotations

import jax


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Wrap a host-batch iterator so device_put runs ``depth`` batches
    ahead.  jax device_put is async; holding references to in-flight arrays
    is all that's needed to overlap."""
    import collections
    # depth <= 0 would yield NOTHING (the fill loop never runs and the
    # drain loop exits immediately), silently truncating training to zero
    # iterations — clamp to synchronous single-batch behavior instead
    depth = max(1, int(depth))
    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            # shared checked put (parallel/mesh.py) — works for any
            # batch pytree, not just dicts
            from .mesh import checked_put
            return checked_put(batch, sharding)
        return jax.device_put(batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
