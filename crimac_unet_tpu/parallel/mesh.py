"""Device mesh and sharding helpers.

The reference has no device parallelism at all (single CUDA/CPU device,
SURVEY.md §2); the TPU-native design scales with pure data parallelism over
a 1-D ``Mesh('data')`` on ICI: train batches and inference patch batches are
sharded on the leading axis, parameters are replicated, and gradient
all-reduce happens inside jit via the sharding propagation (no explicit
collectives; XLA inserts them on ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> bool:
    """Multi-host scale-out entry point (SURVEY.md §5 distributed backend:
    the reference has none; ours is ``jax.distributed`` over DCN with the
    data mesh spanning all hosts' devices).

    Initializes ``jax.distributed`` from explicit arguments or, when they
    are omitted, from the standard environment (``JAX_COORDINATOR_ADDRESS``
    / cloud-TPU metadata).  Idempotent; returns True when a multi-process
    runtime was initialized, False for the single-host no-op.  After a
    successful init, :func:`get_mesh` spans the devices of every host, and
    the existing batch shardings scale unchanged (gradient all-reduce rides
    ICI within a slice and DCN across slices, chosen by XLA)."""
    import os
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = explicit or coordinator_address is not None
    if not explicit and os.environ.get("CRIMAC_MULTIHOST") != "1":
        return False  # single-host: do not touch the runtime
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as exc:  # already initialized
        # jax's message is "distributed.initialize should only be called
        # once." (no 'already' in it)
        msg = str(exc).lower()
        if "already" in msg or "only be called once" in msg:
            return True
        raise


def get_mesh(n_devices: int = 0) -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices (0 = all).

    Asking for more devices than exist raises instead of silently
    returning a smaller mesh — a config pinned to 8 chips running on 2
    would otherwise degrade throughput (and skew any per-device batch
    math) without a word."""
    devs = jax.devices()
    if n_devices and n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"get_mesh({n_devices}) but only {len(devs)} device(s) "
                f"are visible ({devs[0].platform}); use 0 for all")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def checked_put(batch, sharding):
    """``device_put`` any batch pytree under a leading-axis sharding,
    with a LOUD divisibility check first — XLA's own error names neither
    the offending leaf nor the batch. One pytree device_put: jax batches
    the transfers. Shared by ``shard_batch`` and the device prefetcher
    (they used to carry two drifting copies of this check)."""
    import jax.tree_util as jtu
    mesh = getattr(sharding, "mesh", None)
    n = (len(mesh.devices.ravel()) if mesh is not None
         else sharding.num_devices)
    for path, v in jtu.tree_leaves_with_path(batch):
        if np.ndim(v) and np.shape(v)[0] % n != 0:
            raise ValueError(
                f"batch{jtu.keystr(path)} leading axis {np.shape(v)[0]} "
                f"is not divisible by the {n}-device mesh")
    return jax.device_put(batch, sharding)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict on the mesh, batch axis sharded.

    Every array's leading axis must be a multiple of the mesh size;
    callers size their batches to the mesh (SegPipeUNet falls back to
    single-device otherwise)."""
    return checked_put(dict(batch), batch_sharding(mesh))


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
