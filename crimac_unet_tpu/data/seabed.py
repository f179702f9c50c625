"""Seabed-line estimation from raw sv data.

Algorithm (reference data/data_reader.py:433-507): per frequency, the seabed
row is the argmax of a vertical-edge response ``heaviside(g1) * g2`` built
from two 3x3 gradient filters, skipping the top ``n = 10 + 0.05*H`` noise
rows and shifting the line up by ``a = 0.004*H`` for conservatism; pings
whose column maximum is anomalously low (z-score < -8 of log-max) are
repaired by neighbour interpolation; the final line is the rounded median
across frequencies.

Runs once per echogram offline and is cached to ``seabed.npy``
(reference data_reader.py:501-505), so this is host-side numpy/scipy; the
online consumers only read the cached vector.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import convolve2d

_GRAD_1 = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float64)
_GRAD_2 = np.array([[1, 5, 1], [-2, -10, -2], [1, 5, 1]], dtype=np.float64)

REPAIR_THRESHOLD = -8
EDGE = 2


def _seabed_gradient(data: np.ndarray) -> np.ndarray:
    g1 = convolve2d(data, _GRAD_1, mode="same")
    g2 = convolve2d(data, _GRAD_2, mode="same")
    return np.heaviside(g1, 0.0) * g2


def _repair_column_jumps(seabed: np.ndarray, sb_max: np.ndarray) -> None:
    """Replace seabed values in low-signal ping runs with neighbour values
    (in place).  ``seabed``/``sb_max``: (n_pings, n_freq)."""
    n_pings = sb_max.shape[0]
    for f in range(sb_max.shape[1]):
        i = EDGE
        while i < n_pings - EDGE:
            if sb_max[i, f] < REPAIR_THRESHOLD:
                idx_0 = i
                while i < n_pings and sb_max[i, f] < REPAIR_THRESHOLD:
                    i += 1
                idx_1 = i - 1
                if idx_0 <= EDGE and idx_1 + 1 >= n_pings:
                    pass  # whole column flagged: nothing valid to copy from
                elif idx_0 <= EDGE:
                    seabed[idx_0:idx_1 + 1, f] = seabed[idx_1 + 1, f]
                elif idx_1 >= n_pings - EDGE:
                    seabed[idx_0:idx_1 + 1, f] = seabed[idx_0 - 1, f]
                else:
                    seabed[idx_0:idx_1 + 1, f] = np.mean(
                        seabed[[idx_0 - 1, idx_1 + 1], f])
            i += 1


def estimate_seabed(data: np.ndarray) -> np.ndarray:
    """Estimate the per-ping seabed row from an (H, W, C) sv cube.

    Returns an int vector of length W (pings).
    """
    data = np.where(np.isfinite(data), data, 0.0)
    H = data.shape[0]
    n = 10 + int(0.05 * H)   # top noise rows excluded from the argmax
    a = int(0.004 * H)       # conservative upward shift

    seabed = np.zeros(data.shape[1:], dtype=np.float64)
    for c in range(data.shape[2]):
        grad = _seabed_gradient(data[:, :, c])
        seabed[:, c] = -a + n + np.argmax(grad[n:, :], axis=0)

    sb_max = np.max(data[n:, :, :], axis=0)
    sb_max = np.log(1e-10 + sb_max)
    sb_max = sb_max - np.mean(sb_max, axis=0)
    std = np.std(sb_max, axis=0)
    # guard: constant column max (synthetic data) must not z-score to +-inf
    sb_max = sb_max / np.where(std == 0, 1.0, std)

    _repair_column_jumps(seabed, sb_max)
    return np.rint(np.median(seabed, axis=1)).astype(int)


def estimate_seabed_memmap(echogram) -> np.ndarray:
    """Estimate the seabed for a memmap Echogram (all frequencies)."""
    return estimate_seabed(echogram.data_numpy())


def estimate_seabed_zarr(reader, chunk_pings: int = 5000) -> np.ndarray:
    """Estimate the seabed for a zarr survey from its sv data.

    The reference's zarr ``estimate_seabed`` is broken against its own API
    (reads ``self.seabed_dataset`` which is never set,
    data_reader.py:1011-1092); this is a working equivalent for surveys
    without a ``_bottom.zarr``, applying the memmap gradient algorithm in
    ping chunks and stitching the per-chunk lines."""
    n_pings, n_range = reader.shape
    out = np.zeros(n_pings, dtype=int)
    for s in range(0, n_pings, chunk_pings):
        e = min(s + chunk_pings, n_pings)
        slab = reader.get_data_slice(s, e - s)        # (C, ping, range)
        cube = np.transpose(slab, (2, 1, 0))          # (range, ping, C)
        out[s:e] = estimate_seabed(np.nan_to_num(cube, nan=0.0))
    return out
