"""Full-reader gridded evaluation: PR-histogram accumulation on device.

Reproduces the reference's evaluate/validate sliding-window eval
(evaluate.py:39-117, pipeline.py:343-376) as a software-pipelined column-
group loop over the shared GriddedRunner eval program, plus the
region/trace keep-mask builder with the reference's off-by-one and
no-survey-clamp quirks.  Import through the
``crimac_unet_tpu.pipeline.inference`` facade.
"""

from __future__ import annotations

import jax
import numpy as np

from ..constants import LABEL_BOUNDARY_VAL
from ..ops import metrics
from ..ops.label_ops import BIG_ROW
from ..ops.patches import grid_dims, make_grid_starts
from .infer_common import (_convert_labels_host, _fill_hwc_slab,
                           _grid_extent_rows, _quantize_db_u8, _round_up,
                           grid_center_cols)
from .runner import GriddedRunner, _build_meta_inputs

def evaluate_reader(runner: GriddedRunner, reader, hist, eval_mode="all",
                    extend_size=20, chunk_cols=8, progress=False,
                    fixed_R=None):
    """Accumulate the PR histogram over a full reader's sliding-window grid
    (evaluate.py:39-117 + validate_model_testing pipeline.py:343-376).

    Software-pipelined like predict_reader: a prefetch thread builds the
    next column group's host slabs while the device evaluates the current
    one, and the grid is padded to a whole number of ``chunk_cols`` groups
    so every group compiles to the SAME program (the unpadded tail used to
    trigger one extra XLA compile per reader).  Pad columns lie beyond the
    survey: their labels stay BOUNDARY -> IGNORE, contributing nothing to
    the histogram.

    Returns a HOST int64 histogram: each column group accumulates on
    device in int32 (bounded: one group is a few Mpx) and is drained —
    one group behind, preserving overlap — into a 64-bit accumulator, so
    production-scale surveys (1e9+ below-seabed negatives land in bin 0)
    cannot wrap the counters.  ``hist`` may be the int32 device array or
    a previous int64 return value (survey loops chain readers).

    ``fixed_R`` (static_grid): evaluate on a grid padded to ``fixed_R``
    rows instead of this reader's own height — multi-reader surveys then
    share ONE compiled program.  Pad-row patches are force-ignored through
    the same live-patch flag as the pad columns, so the histogram is
    EXACTLY the per-reader one (asserted in tests/test_eval_parity.py)."""
    wh, ww = runner.window
    o = runner.overlap
    sh, sw = runner.stride
    is_zarr = reader.data_format == "zarr"
    if is_zarr:
        n_pings, n_range = reader.shape
    else:
        n_range, n_pings = reader.shape

    seabed_full = np.asarray(reader.get_seabed(0, n_pings)).astype(np.int64)
    seabed_has = np.asarray(reader.seabed_known(0, n_pings))
    sb_abs = np.where(seabed_has, seabed_full, BIG_ROW).astype(np.int64)

    R_ref = _grid_extent_rows(n_range, seabed_full, seabed_has, wh, o)
    R = max(R_ref, int(fixed_R)) if fixed_R else R_ref
    C_total = grid_dims(0, n_pings, ww, o)

    # pad to whole groups: one compiled shape for every group
    C_pad = _round_up(C_total, chunk_cols)
    col_groups = [(j, j + chunk_cols) for j in range(0, C_pad, chunk_cols)]

    keep_global = None
    keep_pad = (0, 0)
    if eval_mode in ("region", "trace"):
        # padded frame covering every CONSULTED slab pixel, including
        # out-of-survey grid margins (the reference masks those too — see
        # _build_keep_mask quirk notes).  Per-axis pads: rows only need
        # ~overlap while the column axis needs up to a whole pad column
        # group — a single symmetric pad would inflate the survey-size
        # allocation ~2.6x at soak scale (review finding r3).  The row pad
        # follows the REFERENCE grid R_ref, not the fixed_R-padded R:
        # pad-row patches are force-ignored, so their keep values are
        # never read, and sizing the frame by a deeper sibling reader's
        # grid would add tens of MB of dead host allocation per shallow
        # reader at soak scale (review finding r3 continuation)
        keep_pad = (max(o, R_ref * sh + o - n_range, 0),
                    max(o, C_pad * sw + o - n_pings, 0))
        keep_global = _build_keep_mask(reader, eval_mode, extend_size,
                                       n_range, n_pings, pad=keep_pad)
    use_keep = keep_global is not None

    def prepare(j0, j1):
        """Host slab construction for columns [j0, j1) (prefetch thread)."""
        Cc = j1 - j0
        # slab covers all patches of the group: x in
        # [j0*sw - o, (j1-1)*sw - o + ww)
        want_x0 = j0 * sw - o
        want_x1 = (j1 - 1) * sw - o + ww
        slab_x0 = max(0, min(want_x0, n_pings))
        slab_x1 = min(n_pings, want_x1)
        Hp = R * sh + 2 * o
        Wp = Cc * sw + 2 * o
        sw_w = max(slab_x1 - slab_x0, 0)

        runner.timer.start("eval_host_slab")
        # fill (and read labels) only to the REFERENCE grid's bottom row:
        # fixed_R pad rows are force-ignored, so their slab content is
        # never consulted — no extra I/O for the static grid
        slab_y1 = min(n_range, R_ref * sh + o)
        # ship only the data-bearing rows; _eval_patches re-grows the pad
        # on device with the exact host fill values (fewer h2d bytes +
        # host work; see GriddedRunner._pad_slab).  fixed_R pins the
        # shipped height — a per-reader crop would re-specialize the
        # compiled program per echogram height
        Hs = Hp if fixed_R else min(o + slab_y1, Hp)
        # HWC layout, matching the predict slab (NHWC patches off the
        # gather with no device relayout)
        data_slab = np.zeros((Hs, Wp, len(runner.frequencies)), np.float32)
        label_slab = np.full((Hs, Wp), float(LABEL_BOUNDARY_VAL),
                             np.float32)
        keep_slab = np.zeros((1, 1), np.bool_)
        x_off = slab_x0 - want_x0

        if sw_w > 0:
            _fill_hwc_slab(reader, runner.frequencies, data_slab, slab_x0,
                           slab_x1, slab_y1, o, x_off)
            if is_zarr:
                lab = reader.get_label_slice(slab_x0, sw_w, 0, slab_y1)
                lab = np.nan_to_num(lab.T, nan=LABEL_BOUNDARY_VAL)
            else:
                lab = np.asarray(reader.label_memmap()[:slab_y1,
                                                       slab_x0:slab_x1])
            label_slab[o:o + slab_y1, x_off:x_off + sw_w] = lab

        if use_keep:
            # slab row i <-> survey row i - o, slab col j <-> want_x0 + j.
            # The padded keep frame only spans the REFERENCE grid's rows
            # (pad-row patches under fixed_R are force-ignored, so rows
            # below Hp_ref are never consulted — zero-fill them instead of
            # growing the survey-size frame)
            pr, pc = keep_pad
            Hp_ref = min(R_ref * sh + 2 * o, Hp)
            keep_slab = np.zeros((Hp, Wp), np.bool_)
            keep_slab[:Hp_ref] = keep_global[
                pr - o:pr - o + Hp_ref, pc + want_x0:pc + want_x0 + Wp]

        sb_pad = np.full(Wp, BIG_ROW, np.int64)
        if sw_w > 0:
            sb_pad[x_off:x_off + sw_w] = sb_abs[slab_x0:slab_x1]

        y0s, x0s = make_grid_starts(R, Cc, sh, sw, o, o, o)
        patch_y0_data = (np.repeat(np.arange(R) * sh, Cc) - o).astype(
            np.int32)
        # live-patch flag: pad COLUMNS (beyond the survey) and pad ROWS
        # (fixed_R > reference grid) are both force-ignored in
        # _eval_patches AFTER the region/trace keep override — the
        # reference grid has no such patches
        col_ok = np.tile((np.arange(j0, j1) < C_total), R)
        row_ok = np.repeat(np.arange(R) < R_ref, Cc)
        col_valid = (col_ok & row_ok).astype(np.int32)

        meta_slab = np.zeros((0, 1, 1), np.float32)
        consts = np.zeros((len(y0s), 0), np.float32)
        if runner.use_meta:
            centers_x = grid_center_cols(
                np.tile(np.arange(j0, j1) * sw, R) - o, ww)
            meta_slab, consts = _build_meta_inputs(
                runner, reader, Hp, Wp, -o, want_x0, centers_x)

        # transfer_dtype quantization (same knob as the predict path).
        # refine_label_boundary compares raw sv against the 1e-7/1e-4
        # thresholds, and quantized rounding could flip pixels at the
        # threshold edge — so under bfloat16/uint8 the exact predicate is
        # computed HERE from the float32 sv and rides as a bool slab
        # (thr_slab): the label chain stays bit-identical to float32 and
        # only the network input quantizes (<=0.02 dB bf16 / <=0.147 dB u8).
        thr_slab = np.zeros((1, 1), np.uint8)
        if runner.transfer_dtype != "float32":
            from ..ops.label_ops import (REFINE_THRESHOLD_HI,
                                         REFINE_THRESHOLD_LO)
            ch = data_slab[..., -1]  # threshold channel (200 kHz)
            # packed rows: 8x fewer h2d bytes than a byte-per-pixel slab
            # (unpacked once on device, _eval_patches)
            thr_slab = np.packbits((ch > REFINE_THRESHOLD_LO)
                                   & (ch < REFINE_THRESHOLD_HI), axis=1)
            # labels ship pre-converted int8 (4x fewer bytes; the mapping
            # mirrors the device chain exactly — _convert_labels_host)
            label_slab = _convert_labels_host(label_slab)
            if runner.transfer_dtype == "uint8":
                data_slab = _quantize_db_u8(data_slab)
            else:
                import ml_dtypes
                data_slab = data_slab.astype(ml_dtypes.bfloat16)
        runner.timer.stop("eval_host_slab")
        # h2d from the prefetch thread (device_put is async) so transfers
        # overlap the previous group's device work.  Grid index vectors
        # and empty meta placeholders are identical across column groups
        # (and readers at fixed geometry) — reuse their device buffers
        runner.timer.start("eval_h2d_dispatch")
        live = min(max(C_total - j0, 0), Cc)
        cache = runner._cached_put
        dev = tuple(jax.device_put(a) for a in (
            data_slab, label_slab, sb_pad)) + (
            (jax.device_put(keep_slab) if keep_slab.size > 1
             else cache(("keep0",), lambda: keep_slab)),
            (jax.device_put(thr_slab) if thr_slab.size > 1
             else cache(("thr0",), lambda: thr_slab))) + (
            (jax.device_put(meta_slab) if meta_slab.size
             else cache(("meta0",), lambda: meta_slab)),
            (jax.device_put(consts) if consts.size
             else cache(("consts0", len(y0s)), lambda: consts)),
            cache(("ey0", R, Cc), lambda: y0s),
            cache(("ex0", R, Cc), lambda: x0s),
            cache(("epy", R, Cc), lambda: patch_y0_data),
            cache(("ecv", R, Cc, R_ref, live), lambda: col_valid))
        runner.timer.stop("eval_h2d_dispatch")
        return dev

    it = col_groups
    if progress:
        from tqdm import tqdm
        it = tqdm(col_groups, desc="Evaluating ...")

    from concurrent.futures import ThreadPoolExecutor
    executor = ThreadPoolExecutor(max_workers=1)
    try:
        fut = executor.submit(prepare, *col_groups[0]) if col_groups \
            else None

        # reference asymmetry: memm eval zeroes dB data at the boundary
        # (define_data_transform_test), zarr eval does not (evaluate.py:47)
        border_zero = not is_zarr
        hist_host = np.zeros((2, metrics.N_F16_BINS), np.int64)
        hist_host += np.asarray(hist).astype(np.int64)  # incoming carry
        pending_hist = None
        for idx, _ in enumerate(it):
            (data_slab, label_slab, sb_pad, keep_slab, thr_slab, meta_slab,
             consts, y0s, x0s, patch_y0_data, col_valid) = fut.result()
            if idx + 1 < len(col_groups):
                fut = executor.submit(prepare, *col_groups[idx + 1])
            runner.timer.start("eval_device_chunk")
            group_hist = runner._eval_patches(
                runner.variables,
                metrics.new_histogram(), data_slab, label_slab, sb_pad,
                keep_slab, thr_slab, meta_slab, consts, y0s, x0s,
                patch_y0_data, col_valid, use_keep, border_zero, is_zarr,
                runner.use_meta, grid_h=R * sh + 2 * o)
            runner.timer.stop("eval_device_chunk")
            # drain one group behind so the d2h overlaps the next group
            if pending_hist is not None:
                hist_host += np.asarray(pending_hist).astype(np.int64)
            pending_hist = group_hist
        if pending_hist is not None:
            hist_host += np.asarray(pending_hist).astype(np.int64)
    finally:
        executor.shutdown(wait=True, cancel_futures=True)
    return hist_host


def _build_keep_mask(reader, eval_mode, extend_size, n_range, n_pings,
                     pad=0):
    """Keep mask from extended school bboxes (extend_label_masks.py:35-98):
    region = bbox +- extend in both axes; trace = full water column for
    pings within extend of a school.  ``pad`` is an int or a per-axis
    ``(row_pad, col_pad)``; returns a
    ``(n_range + 2*row_pad, n_pings + 2*col_pad)`` bool array where
    survey pixel ``(y, x)`` lives at index ``(y + row_pad, x + col_pad)``
    — the pad rows/cols
    carry the mask for OUT-OF-SURVEY grid pixels, which the reference
    does mask (see below).

    REFERENCE QUIRKS kept for bit parity (verified against the actual
    reference pipeline in tests/test_reference_parity.py):

    * off-by-one: the reference's mask transform computes the crop origin
      as ``center - shape//2`` (extend_label_masks.py:64) while the
      data/label crops use ``center - shape//2 + 1`` (utils/np.py
      getGrid), so its keep mask lands one pixel DOWN-RIGHT of the
      annotations it targets.  Reproduced by painting every extended
      bbox shifted by +1 in both axes (trace keeps rows [1, n_range+1)).
    * no survey clamp: the reference clamps bbox painting to each CROP,
      not to the survey (extend_label_masks.py:90-95), so out-of-survey
      grid pixels inside an extended bbox keep their boundary label
      (-> ignored) instead of becoming counted ``-1`` negatives.
      Reproduced by painting unclamped into the padded frame.

    bool dtype: the dense survey-size mask is the eval path's one big
    host allocation (a 50k-ping survey would be ~200 MB at float32 vs
    ~50 MB bool), and every consumer only tests truthiness."""
    pr, pc = (pad, pad) if np.isscalar(pad) else pad
    keep = np.zeros((n_range + 2 * pr, n_pings + 2 * pc),
                    dtype=np.bool_)
    bboxes = reader.get_object_bounding_boxes()  # (n, 4) y0 y1 x0 x1
    for (y0, y1, x0, x1) in bboxes:
        if eval_mode == "region":
            ry0, ry1 = y0 - extend_size, y1 + extend_size
        else:
            ry0, ry1 = 0, n_range
        rx0, rx1 = x0 - extend_size, x1 + extend_size
        keep[max(ry0 + 1 + pr, 0):max(ry1 + 1 + pr, 0),
             max(rx0 + 1 + pc, 0):max(rx1 + 1 + pc, 0)] = True
    return keep
