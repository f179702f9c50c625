"""HBM-resident sample pool: device-side training crop gather.

The default training path extracts crops on the host and ships ~8 MB per
batch to the device.  This pool inverts that: echograms are uploaded to
device HBM once (padded, stacked), and each training step gathers its crops
on device from host-provided (echogram, center) coordinates — per-step h2d
shrinks to a few dozen bytes, and the gather fuses into the train step.

Crop semantics match the host path exactly (slice + boundary fill per
utils/grids.crop_bounds, non-finite sv scrubbed to 0 like get_crop_memmap,
window-taller-than-column recentering handled host-side by the samplers'
coordinate generation + the pool's `prepare_center`).

Memory: E echograms of (C, H_max, W_max) float32 (+ int32 labels) plus a
window-sized boundary margin; use for survey subsets that fit HBM
(e.g. 2 GB holds ~40 echograms of 1000x3000x4).  Opt-in:

    pool = DeviceSamplePool(readers, frequencies, window)
    idxs, centers = pool.prepare_batch(host_samples)
    data, labels = pool.gather(idxs, centers)   # device arrays, NCHW
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DATA_BOUNDARY_VAL, LABEL_BOUNDARY_VAL


class DeviceSamplePool:
    def __init__(self, readers, frequencies, window):
        assert all(r.data_format == "memmap" for r in readers), \
            "DeviceSamplePool holds memmap echograms (zarr surveys are " \
            "chunked; pool whole-survey slabs instead)"
        self.window = tuple(window)
        self.frequencies = sorted(frequencies)
        self.readers = list(readers)
        self.index = {id(r): i for i, r in enumerate(readers)}
        wh, ww = self.window

        H = max(r.shape[0] for r in readers)
        W = max(r.shape[1] for r in readers)
        E, C = len(readers), len(self.frequencies)
        # boundary margins so every in-range crop start is a valid slice
        data = np.zeros((E, C, H + 2 * wh, W + 2 * ww), np.float32)
        labels = np.full((E, H + 2 * wh, W + 2 * ww), LABEL_BOUNDARY_VAL,
                         np.int32)
        for i, r in enumerate(readers):
            h, w = r.shape
            raw = np.stack([np.asarray(m) for m in
                            r.data_memmaps(self.frequencies)])
            raw = np.nan_to_num(raw, nan=DATA_BOUNDARY_VAL,
                                posinf=DATA_BOUNDARY_VAL,
                                neginf=DATA_BOUNDARY_VAL)
            data[i, :, wh:wh + h, ww:ww + w] = raw
            # out-of-data area inside the padded canvas must stay BOUNDARY
            lab = np.asarray(r.label_memmap()).astype(np.int32)
            labels[i, wh:wh + h, ww:ww + w] = lab
            # pad short echograms' data region with the boundary fill (0)
            # already via the zero canvas; labels already BOUNDARY
        self.data = jax.device_put(data)
        self.labels = jax.device_put(labels)
        self.pad = (wh, ww)

    def prepare_center(self, reader, center):
        """Host-side: map a sampler (center, reader) to pool coordinates,
        applying the host crop's window-taller-than-column recentering
        (reference dataset.py:259-261)."""
        wh, ww = self.window
        y, x = int(center[0]), int(center[1])
        if reader.shape[0] <= wh:
            y = reader.shape[0] // 2
        # crop upper-left in padded-canvas coordinates
        y0 = y - wh // 2 + 1 + wh
        x0 = x - ww // 2 + 1 + ww
        return self.index[id(reader)], y0, x0

    def prepare_batch(self, samples):
        """[(reader, center), ...] -> (ech_idx (B,), starts (B, 2)) int32."""
        idxs, starts = [], []
        for reader, center in samples:
            e, y0, x0 = self.prepare_center(reader, center)
            idxs.append(e)
            starts.append((y0, x0))
        return (np.asarray(idxs, np.int32),
                np.asarray(starts, np.int32))

    def gather(self, ech_idx, starts):
        """(B,) echogram indices + (B, 2) crop upper-lefts (padded coords)
        -> data (B, C, wh, ww) float32, labels (B, wh, ww) int32."""
        return _gather_crops(self.data, self.labels, jnp.asarray(ech_idx),
                             jnp.asarray(starts), self.window)


@partial(jax.jit, static_argnames=("window",))
def _gather_crops(pool_data, pool_labels, ech_idx, starts, window):
    # pool arrays are explicit arguments (not closed over) so the compiled
    # gather references the resident HBM buffers instead of embedding them
    wh, ww = window
    C = pool_data.shape[1]

    def one(e, s):
        d = jax.lax.dynamic_slice(pool_data, (e, 0, s[0], s[1]),
                                  (1, C, wh, ww))[0]
        l = jax.lax.dynamic_slice(pool_labels, (e, s[0], s[1]),
                                  (1, wh, ww))[0]
        return d, l

    return jax.vmap(one)(ech_idx, starts)
