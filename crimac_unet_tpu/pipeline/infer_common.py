"""Shared primitives of the gridded inference/eval pipeline.

Quantization laws (h2d dB codes, d2h probability codes), the device-side
bit-unpack for packed predicate masks, the host label conversion mirror,
the HWC slab filler, and the reference grid-extent law — used by both the
predict (pipeline/predict.py) and eval (pipeline/eval_gridded.py) drivers
and by the jit programs in pipeline/runner.py.  Import them from
``crimac_unet_tpu.pipeline.inference`` (the stable facade).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import data_ops
from ..ops.patches import grid_dims

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _unpack_bits(packed, n_cols: int):
    """Device-side inverse of ``np.packbits(mask, axis=1)`` (big-endian
    bit order): (H, ceil(n/8)) uint8 -> (H, n_cols) bool."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
    return (bits.reshape(packed.shape[0], -1)[:, :n_cols]) != 0


# transfer_dtype='uint8': dB codes per the [-75, 0] clip range.  code =
# round((dB + 75) * 255/75); dequant = code * 75/255 - 75 (exact -75/0 at
# the endpoints, <=75/255/2 = 0.147 dB quantization error between).
DB_U8_SCALE = 255.0 / 75.0

# output_dtype='uint8' d2h codes: code -> float16(code / 255), the value
# written to the prediction store.  One 256-entry table keeps the
# dequantization a single fancy-index on the host drain path.
_U8_PROB_DEQUANT = (np.arange(256, dtype=np.float32)
                    / np.float32(255.0)).astype(np.float16)


def _quantize_prob_u8(probs):
    """The output_dtype='uint8' quantization law, shared by the live d2h
    path (_mask_output) and the AOT artifact (pipeline/export.py) so the
    two cannot drift: codes ``round(p * 255)`` — softmax outputs are
    finite in [0, 1] so the round-then-cast is exact and masked pixels
    (0.0) map to code 0; dequant = code / 255 (``_U8_PROB_DEQUANT``)."""
    return jnp.round(probs * 255.0).astype(jnp.uint8)


def _quantize_db_u8(x):
    """Host-side dB transform + clip + 8-bit quantization
    (transfer_dtype='uint8' serving mode).

    Matches the device chain remove_nan_inf -> db_with_limits exactly for
    non-finite sv: scrub to 0 FIRST (like the device's isfinite scrub —
    doing it after the log would let +inf slip through the clip as 0 dB
    full-signal), then dB(1e-10) = -100 -> clipped -75 -> code 0.  One
    documented divergence: NEGATIVE sv (possible in noise-subtracted
    recordings) yields NaN through the exact chain's log10 and propagates
    NaN into the network; uint8 codes cannot carry NaN, so negatives
    clamp to code 0 (-75 dB) instead (DIVERGENCES.md)."""
    x = np.where(np.isfinite(x), x, np.float32(0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        d = (10.0 * np.log10(x + 1e-10)).astype(np.float32, copy=False)
    np.clip(d, -75.0, 0.0, out=d)        # negatives' NaN survives clip ...
    d = np.where(np.isfinite(d), d, -75.0)  # ... scrub it to the floor
    d += 75.0
    d *= DB_U8_SCALE
    d += 0.5                             # round-half-up via the trunc cast
    return d.astype(np.uint8)


def _net_db_input(x, use_meta: bool):
    """Device-side network-input transform shared by the predict (patch +
    slab) and eval paths so the three cannot drift: uint8 arrays hold
    host-computed dB codes (_quantize_db_u8 — dequantize only; the scaled
    meta variant reduces to code/255 exactly), anything else holds raw sv
    (scrub non-finite to 0, then db_with_limits[_scaled]).  dtype is
    static at trace time, so each jit program compiles exactly one
    branch."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32)
        return x / 255.0 if use_meta else x / DB_U8_SCALE - 75.0
    x = x.astype(jnp.float32)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return data_ops.db_with_limits_scaled(x) if use_meta \
        else data_ops.db_with_limits(x)


def _convert_labels_host(labels):
    """Host mirror of the device label-conversion step: the float32 eval
    path casts the gathered label patch ``astype(int32)`` (truncation)
    and then applies ops.label_ops.convert_label_indexing(...,
    mark_unused_species=True) — raw species codes {0, 27, 1} -> {0, 1, 2},
    other positive codes -> LABEL_UNUSED_SPECIES, the rest ->
    LABEL_IGNORE_VAL.  This mirrors BOTH steps exactly (incl. the
    truncation of fractional codes: 27.5 -> 27 -> SANDEEL, -0.5 -> 0 ->
    BACKGROUND); non-finite values — undefined through an int32 cast —
    map deterministically to LABEL_IGNORE_VAL (zarr slabs are
    nan_to_num'd to BOUNDARY == IGNORE before reaching here anyway).
    Quantized-transfer eval converts the label slab here and ships int8
    (4x fewer label bytes than float32; every converted value fits
    int8); equality with the device chain is pinned in
    tests/test_eval_parity.py."""
    from ..constants import (BACKGROUND, LABEL_IGNORE_VAL,
                             LABEL_UNUSED_SPECIES, OTHER, RAW_OTHER,
                             RAW_SANDEEL, SANDEEL)
    if np.issubdtype(labels.dtype, np.floating):
        labels = np.where(np.isfinite(labels), labels,
                          float(LABEL_IGNORE_VAL))
    li = labels.astype(np.int32)  # device-equal truncation
    out = np.full(li.shape, LABEL_IGNORE_VAL, np.int8)
    out[li == 0] = BACKGROUND
    out[li == RAW_SANDEEL] = SANDEEL
    out[li == RAW_OTHER] = OTHER
    unused = (li > 0) & (li != RAW_SANDEEL) & (li != RAW_OTHER)
    out[unused] = LABEL_UNUSED_SPECIES
    return out


def _fill_hwc_slab(reader, frequencies, data_slab, slab_x0, slab_x1,
                   slab_y1, row_off, x_off):
    """Read survey columns [slab_x0, slab_x1) x rows [0, slab_y1) for all
    ``frequencies`` and write them into ``data_slab`` (an (Hp, Wp, C)
    HWC-layout host array) at (row_off, x_off).  Shared by the predict and
    eval slab builders so their device layouts cannot diverge."""
    w = slab_x1 - slab_x0
    if w <= 0:
        return
    region = np.s_[row_off:row_off + slab_y1, x_off:x_off + w, :]
    if reader.data_format == "zarr":
        # single-pass native decode+scatter straight into the HWC slab
        # (no intermediate (C, ping, range) buffer, no transpose pass)
        reader.read_data_into(slab_x0, w, 0, slab_y1, frequencies,
                              data_slab, region)
    else:
        # per-channel strided assignment: one pass, no stacked temporary
        for c, m in enumerate(reader.data_memmaps(frequencies)):
            data_slab[row_off:row_off + slab_y1, x_off:x_off + w, c] = \
                m[:slab_y1, slab_x0:slab_x1]


def grid_center_cols(x0_data, ww):
    """Patch-center ping coordinates from crop-origin ping coordinates —
    the exact inverse of :func:`utils.grids.crop_bounds` on the ping
    axis for BOTH window parities (origin = center - (ww+1)//2 + 1, so
    center = origin - 1 + (ww+1)//2).  Pinned against crop_bounds in
    tests/test_properties.py."""
    return np.asarray(x0_data) - 1 + (ww + 1) // 2


def _grid_extent_rows(n_range: int, seabed, known, wh: int, o: int) -> int:
    """Reference grid height (patch-grid rows) for one seabed vector: range
    capped at max seabed + 50, pings WITHOUT a seabed estimate counting as
    full water column (gridded.py:121-163; review finding r3 — raw zeros
    must not collapse the grid).  The single source of the extent law for
    predict_reader, evaluate_reader and the static-grid helpers."""
    sb_eff = np.where(known, seabed, n_range)
    end_range = int(min(max(sb_eff.max() + 50, 1), n_range))
    return grid_dims(0, end_range, wh, o)


def grid_height_for_reader(reader, wh: int, o: int,
                           start_ping: int = 0) -> int:
    """Reference grid height (patch-grid rows) for one reader — the same
    extent law evaluate_reader/predict_reader use (gridded.py:121-163,
    range capped at max seabed + 50; unknown seabed = full water column).
    Callers evaluating several readers under ``static_grid`` take the max
    over readers and pass it as ``fixed_R`` so every reader shares one
    compiled eval program.  ``start_ping`` restricts the seabed scan to
    the pings a prediction starting there can cover."""
    is_zarr = reader.data_format == "zarr"
    if is_zarr:
        n_pings, n_range = reader.shape
    else:
        n_range, n_pings = reader.shape
    sb = np.asarray(reader.get_seabed(0, n_pings)).astype(np.int64)
    has = np.asarray(reader.seabed_known(0, n_pings))
    return _grid_extent_rows(n_range, sb[start_ping:], has[start_ping:],
                             wh, o)
