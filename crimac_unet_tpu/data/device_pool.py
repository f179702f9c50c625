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
(e.g. 2 GB holds ~40 echograms of 1000x3000x4).  ``pool_bytes`` /
``fits_budget`` gate the opt-in; ``run_training`` wires this in as the
default memm path with a host-crop fallback.  The zarr counterpart
:class:`ZarrSamplePool` uploads whole-survey slabs through ping-chunked
reads (bounded host RAM) + donated on-device slice updates.

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


def canvas_dims(readers, window) -> tuple:
    """(E, H, W, Hp, Wp): padded-canvas geometry shared by the budget
    gate (``pool_bytes``) and BOTH pool constructors — three hand-copied
    formulas would let the gate drift from the actual allocation and
    reintroduce the mid-upload RESOURCE_EXHAUSTED it exists to prevent."""
    wh, ww = window
    if readers[0].data_format == "memmap":
        H = max(r.shape[0] for r in readers)
        W = max(r.shape[1] for r in readers)
    else:  # zarr shape = (ping, range)
        H = max(r.shape[1] for r in readers)
        W = max(r.shape[0] for r in readers)
    return len(readers), H, W, H + 2 * wh, W + 2 * ww


def pool_bytes(readers, frequencies, window) -> int:
    """HBM footprint of pooling these readers: padded float32 data canvas +
    int32 labels canvas (both with a window-sized boundary margin)."""
    E, _, _, Hp, Wp = canvas_dims(readers, window)
    cells = E * Hp * Wp
    return cells * len(frequencies) * 4 + cells * 4


def fits_budget(readers, frequencies, window, budget_mb=2048) -> bool:
    return pool_bytes(readers, frequencies, window) <= budget_mb * 2 ** 20


# reference metadata channel order (batch/dataset.py:288-351)
META_ORDER = ("portion_year", "portion_day", "time_diff", "depth_rel",
              "depth_abs_surface", "depth_abs_seabed")


def _meta_vector_arrays(readers, meta_channels):
    """Per-echogram metadata VECTORS for the on-device meta computation
    (``_gather_meta_crops``): portion_of_day / time_diff / seabed padded
    to the widest survey, portion_year scalars, and per-echogram ping
    counts for the reference's index clamping.  A few KB per echogram —
    the meta channel MAPS are computed on device from these inside the
    fused train/eval step, so pooled metadata training costs no extra
    HBM canvases and no host crop work."""
    E = len(readers)
    W = max(r.shape[1] for r in readers)
    pod = np.zeros((E, W), np.float32)
    tdiff = np.zeros((E, W), np.float32)
    seabed = np.zeros((E, W), np.float32)
    pyear = np.zeros((E,), np.float32)
    npings = np.zeros((E,), np.int32)
    mc = meta_channels
    need_sb = any(mc.get(k) for k in ("depth_rel", "depth_abs_surface",
                                      "depth_abs_seabed"))
    for i, r in enumerate(readers):
        n = r.shape[1]
        npings[i] = n
        if mc.get("portion_year"):
            pyear[i] = r.portion_of_year_scalar
        if mc.get("portion_day"):
            pod[i, :n] = r.portion_of_day_vector
        if mc.get("time_diff"):
            tdiff[i, :n] = r.time_vector_diff
        if need_sb:
            seabed[i, :n] = np.asarray(r.get_seabed(0, n))
    return tuple(jax.device_put(a)
                 for a in (pod, tdiff, seabed, pyear, npings))


@partial(jax.jit, static_argnames=("window", "flags"))
def _gather_meta_crops(pod, tdiff, seabed, pyear, npings, ech_idx, starts,
                       window, flags):
    """(B, M, wh, ww) float32 metadata crops computed ON DEVICE from
    per-echogram vectors — the exact reference meta laws
    (batch/dataset.py:288-351) evaluated from pool coordinates: the
    sampler center is recovered from the crop start (inverting
    ``prepare_center``, recentering included), then crop_meta's
    ``arange(center - w//2, center + w//2)`` grid (NO +1 shift — the
    meta grid sits offset from the data crop for even windows) and its
    index clamping are applied.  ``flags`` is the tuple of enabled
    channel names in reference order (META_ORDER)."""
    wh, ww = window

    rows_j = jnp.arange(wh, dtype=jnp.float32)
    cols_j = jnp.arange(ww, dtype=jnp.int32)
    # survey-coordinate sampler center from the padded-canvas start
    # (prepare_center: s = center - (w+1)//2 + 1 + pad)
    y_off = (wh + 1) // 2 - 1 - wh
    x_off = (ww + 1) // 2 - 1 - ww

    def one(e, s):
        n = npings[e]
        yc = s[0] + y_off
        xc = s[1] + x_off
        r = rows_j + jnp.float32(yc - wh // 2)
        c = jnp.clip(cols_j + (xc - ww // 2), 0, n - 1)
        parts = []
        if "portion_year" in flags:
            parts.append(jnp.full((wh, ww), pyear[e]))
        if "portion_day" in flags:
            ang = 2 * jnp.pi * pod[e, jnp.clip(xc, 0, n - 1)]
            parts.append(jnp.full((wh, ww), jnp.sin(ang)))
            parts.append(jnp.full((wh, ww), jnp.cos(ang)))
        if "time_diff" in flags:
            parts.append(jnp.broadcast_to(tdiff[e, c][None, :], (wh, ww)))
        sb = seabed[e, c]
        if "depth_rel" in flags:
            parts.append(r[:, None] / sb[None, :])
        if "depth_abs_surface" in flags:
            parts.append(jnp.broadcast_to(r[:, None] / wh, (wh, ww)))
        if "depth_abs_seabed" in flags:
            parts.append((sb[None, :] - r[:, None]) / wh)
        return jnp.stack(parts)

    return jax.vmap(one)(ech_idx, starts)


class DeviceSamplePool:
    data_format = "memmap"

    def __init__(self, readers, frequencies, window, meta_channels=None):
        if not all(r.data_format == "memmap" for r in readers):
            raise ValueError(
                "DeviceSamplePool holds memmap echograms; use "
                "ZarrSamplePool for zarr surveys")
        self.window = tuple(window)
        # CALLER order, like the host crop path (RandomPatchDataset
        # stacks channels as given) — an internal sort silently permuted
        # channels whenever the caller's order differed
        self.frequencies = list(frequencies)
        self.readers = list(readers)
        self.index = {id(r): i for i, r in enumerate(readers)}
        wh, ww = self.window

        E, H, W, Hp, Wp = canvas_dims(readers, window)
        C = len(self.frequencies)
        # boundary margins so every in-range crop start is a valid slice
        data = np.zeros((E, C, Hp, Wp), np.float32)
        labels = np.full((E, Hp, Wp), LABEL_BOUNDARY_VAL, np.int32)
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
        self.meta_flags = ()
        self.meta_vectors = None
        if meta_channels and any(meta_channels.values()):
            if wh % 2 or ww % 2:
                # crop_meta (the host path this must stay bit-identical
                # to) rejects odd windows — mirror the guard here instead
                # of silently filling a shifted grid
                raise ValueError(
                    f"metadata channels require even patch dims, got "
                    f"{self.window} (see data/meta_channels.crop_meta)")
            self.meta_flags = tuple(k for k in META_ORDER
                                    if meta_channels.get(k))
            self.meta_vectors = _meta_vector_arrays(readers, meta_channels)

    def prepare_center(self, reader, center):
        """Host-side: map a sampler (center, reader) to pool coordinates,
        applying the host crop's window-taller-than-column recentering
        (reference dataset.py:259-261)."""
        wh, ww = self.window
        y, x = int(center[0]), int(center[1])
        if reader.shape[0] <= wh:
            y = reader.shape[0] // 2
        # crop upper-left in padded-canvas coordinates (origin convention
        # shared with utils/grids.crop_bounds — (N+1)//2)
        y0 = y - (wh + 1) // 2 + 1 + wh
        x0 = x - (ww + 1) // 2 + 1 + ww
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


class ZarrSamplePool:
    """HBM-resident zarr survey slabs with the same gather interface.

    Each survey's (freq, range, ping) slab is streamed to the device in
    ping-chunked reads (bounded host RAM; one donated dynamic_update_slice
    per chunk, so HBM holds exactly one canvas), nan-scrubbed like
    ``DataReaderZarr.crop_data`` (reference batch/dataset.py:358-407), with
    the categorical label overlay (get_label_slice semantics) as int32."""

    data_format = "zarr"

    def __init__(self, readers, frequencies, window, meta_channels=None,
                 chunk_pings=2048):
        if not all(r.data_format == "zarr" for r in readers):
            raise ValueError("ZarrSamplePool holds zarr surveys; use "
                             "DeviceSamplePool for memmap echograms")
        if meta_channels and any(meta_channels.values()):
            raise ValueError("metadata channels are memmap-only (reference "
                             "dataset.py:245-252); ZarrSamplePool cannot "
                             "carry them")
        self.meta_flags = ()
        self.meta_vectors = None
        self.window = tuple(window)
        # caller order, like the host crop path (see DeviceSamplePool)
        self.frequencies = list(frequencies)
        self.readers = list(readers)
        self.index = {id(r): i for i, r in enumerate(readers)}
        wh, ww = self.window

        E, H, W, Hp, Wp = canvas_dims(readers, window)
        C = len(self.frequencies)

        @partial(jax.jit, donate_argnums=(0,))
        def put_data(buf, chunk, e, x0):
            return jax.lax.dynamic_update_slice(buf, chunk, (e, 0, wh, x0))

        @partial(jax.jit, donate_argnums=(0,))
        def put_labels(buf, chunk, e, x0):
            return jax.lax.dynamic_update_slice(buf, chunk, (e, wh, x0))

        data = jnp.zeros((E, C, Hp, Wp), jnp.float32)
        labels = jnp.full((E, Hp, Wp), LABEL_BOUNDARY_VAL, jnp.int32)
        # fixed-shape staging: ranges pad to the canvas H (same fill as
        # the canvas init) and tail chunks SHIFT LEFT to end at the
        # survey edge, rewriting overlap columns with identical source
        # data — so every reader with n_pings >= chunk_pings reuses ONE
        # compiled (C, H, chunk_pings) update instead of one XLA compile
        # per (n_range, tail-width) shape (review finding r3: ~4 compiles
        # per reader at pool build on heterogeneous survey sets)
        stage_d = np.zeros((C, H, chunk_pings), np.float32)
        stage_l = np.full((H, chunk_pings), LABEL_BOUNDARY_VAL, np.int32)
        for i, r in enumerate(readers):
            n_pings, n_range = r.shape
            for s in range(0, n_pings, chunk_pings):
                if n_pings >= chunk_pings:
                    s = min(s, n_pings - chunk_pings)  # tail shift
                    n = chunk_pings
                else:
                    n = n_pings  # short survey: one exact-width chunk
                raw = r.get_data_slice(s, n, 0, n_range, self.frequencies)
                # EXACTLY the host crop scrub (zarr_reader.crop_data:
                # nan_to_num with only nan= overridden, so +/-Inf become
                # +/-3.4e38 -> dB-clip extremes, NOT 0.0) — the pool is a
                # transport optimization and must not change semantics
                raw = np.nan_to_num(raw.swapaxes(1, 2),
                                    nan=DATA_BOUNDARY_VAL)
                lab = np.nan_to_num(r.get_label_slice(s, n, 0, n_range).T,
                                    nan=LABEL_BOUNDARY_VAL)
                if n == chunk_pings:
                    stage_d[:] = 0.0
                    stage_l[:] = LABEL_BOUNDARY_VAL
                    stage_d[:, :n_range, :] = raw
                    stage_l[:n_range, :] = lab
                    d_chunk, l_chunk = stage_d, stage_l
                else:
                    d_chunk = np.zeros((C, H, n), np.float32)
                    l_chunk = np.full((H, n), LABEL_BOUNDARY_VAL, np.int32)
                    d_chunk[:, :n_range, :] = raw
                    l_chunk[:n_range, :] = lab
                data = put_data(data,
                                jnp.asarray(d_chunk[None], jnp.float32),
                                i, ww + s)
                labels = put_labels(labels,
                                    jnp.asarray(l_chunk[None], jnp.int32),
                                    i, ww + s)
        self.data = data
        self.labels = labels
        self.pad = (wh, ww)

    def prepare_center(self, reader, center):
        """Zarr crops never recenter (reference get_crop_zarr clips + pads
        instead, dataset.py:358-407)."""
        wh, ww = self.window
        y0 = int(center[0]) - (wh + 1) // 2 + 1 + wh
        x0 = int(center[1]) - (ww + 1) // 2 + 1 + ww
        return self.index[id(reader)], y0, x0

    prepare_batch = DeviceSamplePool.prepare_batch
    gather = DeviceSamplePool.gather


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
