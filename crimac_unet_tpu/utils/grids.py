"""Host-side crop / grid primitives.

These replace the reference's per-pixel index-grid gather
(crimac_unet/utils/np.py:40-47, :347-381) with vectorized slice+pad crops —
same boundary-fill contract, one contiguous memmap/array read instead of a
fancy-indexed gather.
"""

from __future__ import annotations

import numpy as np


def crop_bounds(center: np.ndarray, window: np.ndarray) -> tuple:
    """Upper-left (inclusive) and lower-right (exclusive) data coordinates of a
    patch around ``center``.

    The reference convention (utils/np.py getGrid: offsets
    ``linspace(-((N+1)//2) + 1, N//2, N)``) covers
    ``[center - (N+1)//2 + 1, center + N//2 + 1)`` per axis — identical
    to ``center - N//2 + 1`` for even N (every shipped geometry), one
    pixel earlier for odd N (review finding r3: ``N//2`` shifted odd
    windows one pixel down-right).
    """
    center = np.asarray(center)
    window = np.asarray(window)
    upper_left = center - (window + 1) // 2 + 1
    lower_right = upper_left + window
    return upper_left.astype(int), lower_right.astype(int)


def patch_coord_to_data_coord(patch_coords, center_coord, patch_size):
    """Patch-local -> data coordinates — the inverse of
    :func:`crop_bounds`.

    The reference computes this as ``+ center - size//2 + 1``
    (utils/np.py:378-380), which for odd sizes is one pixel off its OWN
    crop grid (getGrid uses ``(N+1)//2``; reference never ships an odd
    geometry so its quirk is unreachable).  We keep stitching consistent
    with the crops for both parities (documented in DIVERGENCES.md)."""
    return (np.asarray(patch_coords) + np.asarray(center_coord)
            - (np.asarray(patch_size) + 1) // 2 + 1).astype(int)


def extract_crop_2d(arr, center, window, boundary_val):
    """Crop ``window`` around ``center`` from a 2-D array, filling pixels that
    fall outside the array with ``boundary_val``.

    Semantics equal to the reference's grid gather with boundary fill
    (utils/np.py:347-362) but implemented as a clipped slice + pad: a single
    contiguous read, which matters for np.memmap sources.
    """
    (y0, x0), (y1, x1) = crop_bounds(center, window)
    H, W = arr.shape
    cy0, cx0 = max(y0, 0), max(x0, 0)
    cy1, cx1 = min(y1, H), min(x1, W)

    out = np.full(tuple(window), boundary_val, dtype=arr.dtype)
    if cy1 > cy0 and cx1 > cx0:
        out[cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0] = arr[cy0:cy1, cx0:cx1]
    return out


def extract_crop_3d(arr, center, window, boundary_val):
    """Channel-first variant of :func:`extract_crop_2d` for (C, H, W) arrays
    (reference utils/np.py:364-375)."""
    (y0, x0), (y1, x1) = crop_bounds(center, window)
    C, H, W = arr.shape
    cy0, cx0 = max(y0, 0), max(x0, 0)
    cy1, cx1 = min(y1, H), min(x1, W)

    out = np.full((C,) + tuple(window), boundary_val, dtype=arr.dtype)
    if cy1 > cy0 and cx1 > cx0:
        out[:, cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0] = arr[:, cy0:cy1, cx0:cx1]
    return out


def random_point_containing(data_length, window_length, point, slack=20,
                            rng=None):
    """Random coordinate such that the window around it contains ``point``
    (up to ``slack``), clamped into the data
    (reference utils/np.py:23-37)."""
    rng = rng or np.random
    if data_length <= window_length:
        return data_length // 2

    half = window_length // 2 - slack
    low = max(half, point - half)
    high = min(data_length - half, point + half)
    if high <= low:
        # degenerate interval (reference returns the == case only,
        # utils/np.py:32-33; <= also covers windows smaller than 2*slack)
        return high
    if hasattr(rng, "randint"):  # RandomState (the reference's RNG style)
        return int(rng.randint(low, high))
    return int(rng.integers(low, high))  # modern np.random.Generator
