"""On-device sliding-window patch extraction and grid construction.

The reference extracts every inference patch with per-patch host reads or
host-RAM gathers in DataLoader workers (batch/dataset.py:192-242).  Here the
host ships one padded slab per chunk to the device and patches are gathered
with a vmapped ``dynamic_slice`` — one h2d transfer per chunk instead of per
patch, and the gather fuses into the downstream preprocessing.

Grid semantics match reference batch/samplers/gridded.py:22-95: upper-left
corners at ``start - (overlap+1) + k*stride`` (stride = patch - 2*overlap),
centers at upper-left + patch//2, and the +1 data-coordinate shift of
``patch_coord_to_data_coord`` (utils/np.py:378) makes patch k's *interior*
tile exactly ``[start + k*stride, start + (k+1)*stride)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def grid_dims(start: int, end: int, patch: int, overlap: int) -> int:
    """Number of grid positions along one axis
    (== len(np.arange(start-(o+1), end-(o+1), patch-2*o)))."""
    stride = patch - 2 * overlap
    return int(-(-(end - start) // stride))


def grid_centers(start: int, end: int, patch: int, overlap: int) -> np.ndarray:
    """Reference-identical center coordinates along one axis
    (gridded.py:40-47)."""
    ys_upper_left = np.arange(start - (overlap + 1), end - (overlap + 1),
                              patch - 2 * overlap)
    return ys_upper_left + patch // 2


@partial(jax.jit, static_argnames=("wh", "ww"))
def extract_patches_2d(slab: jnp.ndarray, y0s: jnp.ndarray, x0s: jnp.ndarray,
                       wh: int, ww: int) -> jnp.ndarray:
    """Gather N patches of (wh, ww) from a 2-D slab at upper-left coords
    (y0s, x0s).  Starts must be in-range (the host pads the slab); XLA clamps
    defensively.  Returns (N, wh, ww)."""
    def one(y0, x0):
        return jax.lax.dynamic_slice(slab, (y0, x0), (wh, ww))
    return jax.vmap(one)(y0s, x0s)


@partial(jax.jit, static_argnames=("wh", "ww"))
def extract_patches_3d(slab: jnp.ndarray, y0s: jnp.ndarray, x0s: jnp.ndarray,
                       wh: int, ww: int) -> jnp.ndarray:
    """(C, H, W) slab -> (N, C, wh, ww) patches."""
    C = slab.shape[0]

    def one(y0, x0):
        return jax.lax.dynamic_slice(slab, (0, y0, x0), (C, wh, ww))
    return jax.vmap(one)(y0s, x0s)


def make_grid_starts(R: int, C: int, stride_y: int, stride_x: int,
                     overlap: int, pad_top: int, pad_left: int):
    """Upper-left coords (in padded-slab coordinates) for an R x C patch grid
    in row-major order (y outer, x inner).

    Patch (i, j) covers slab region starting at
    (i*stride_y - overlap + pad_top, j*stride_x - overlap + pad_left).
    """
    ys = np.arange(R) * stride_y - overlap + pad_top
    xs = np.arange(C) * stride_x - overlap + pad_left
    y0s = np.repeat(ys, C)
    x0s = np.tile(xs, R)
    return y0s.astype(np.int32), x0s.astype(np.int32)


def pad_slab_2d(slab: np.ndarray, pad_top: int, pad_bottom: int,
                pad_left: int, pad_right: int, fill) -> np.ndarray:
    return np.pad(slab, ((pad_top, pad_bottom), (pad_left, pad_right)),
                  constant_values=fill)


def pad_slab_3d(slab: np.ndarray, pad_top: int, pad_bottom: int,
                pad_left: int, pad_right: int, fill) -> np.ndarray:
    return np.pad(slab, ((0, 0), (pad_top, pad_bottom),
                         (pad_left, pad_right)), constant_values=fill)
