"""Chunked sliding-window survey prediction and the zarr/memmap writers.

Reproduces the reference's save_predict chunked pipeline
(save_predict.py:137-265) as a software-pipelined host/device loop:
prefetch threads build one raw slab per ping chunk and dispatch the h2d,
the device runs the fused predict program (pipeline/runner.py), and an
ordered writer thread appends to the prediction store.  Import through
the ``crimac_unet_tpu.pipeline.inference`` facade.
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.label_ops import BIG_ROW
from ..ops.patches import grid_dims, make_grid_starts
from .infer_common import (_U8_PROB_DEQUANT, _fill_hwc_slab,
                           _grid_extent_rows, _quantize_db_u8, _round_up,
                           grid_center_cols, grid_height_for_reader)
from .runner import GriddedRunner, _build_meta_inputs, _build_meta_slab_full

def static_grid_shape_for_reader(reader, window, overlap: int,
                                 preload_n_pings: int, start_ping: int = 0):
    """(grid rows, grid cols) of one reader's static (survey-max) predict
    grid: rows from the reader-max seabed, cols from its widest
    preload split.  Survey-level callers predicting several readers under
    ``static_grid`` take the elementwise max over readers and pass it as
    ``fixed_R``/``fixed_C`` so the whole survey shares ONE compiled predict
    program.  Seabed reads hit the reader-level caches (seabed.npy /
    ``_seabed_vec``), so calling this ahead of predict_reader costs no
    extra I/O."""
    wh, ww = window
    is_zarr = reader.data_format == "zarr"
    n_pings = reader.shape[0] if is_zarr else reader.shape[1]
    from ..utils.preload_split import get_data_split
    chunk = preload_n_pings if preload_n_pings > 0 else 5000
    splits = get_data_split([[start_ping, n_pings]], chunk)
    if not len(splits):
        return 0, 0
    R = grid_height_for_reader(reader, wh, overlap,
                               start_ping=int(splits[0][0]))
    C = max(grid_dims(int(a), int(b), ww, overlap) for a, b in splits)
    return R, C


def _keep_row_bound(fin, zero, sb_vec, row_cut, sh, overlap, zarr_pad,
                    nr):
    """Host-side upper bound on the device write mask's last kept row
    (1 + highest row where any pixel CAN be kept), a SUPERSET of the
    device law in GriddedRunner._mask_output — it mirrors the
    label-finiteness / label-zero / seabed-band algebra exactly and only
    ignores the sv-finiteness term (which can only shrink the kept set).
    The d2h transfer is then cropped to this bound at DISPATCH time, so
    the all-zero below-seabed rows never cross the tunnel's slow d2h
    direction while the copy still overlaps later chunks' host work.
    Bit-identical outputs: cropped rows are identically zero on device
    (tests/test_inference_parity.py covers predict bit-parity)."""
    from ..constants import SEABED_PAD
    rows = np.arange(nr, dtype=np.int64)
    if zarr_pad:
        band_top = np.clip((rows // sh) * sh - overlap, 0, None)
        thresh = np.maximum(sb_vec[None, :], band_top[:, None]) + SEABED_PAD
    else:
        thresh = np.broadcast_to(sb_vec[None, :] + SEABED_PAD,
                                 (nr, len(sb_vec)))
    below = rows[:, None] >= thresh
    keep_sup = fin & ~(below & zero)
    keep_sup = keep_sup & (rows < row_cut)[:, None]
    any_row = keep_sup.any(axis=1)
    return int(np.max(np.where(any_row, rows + 1, 0), initial=0))


def predict_reader(runner: GriddedRunner, reader, preload_n_pings=1000,
                   start_ping=0, progress=False, save_labels=False,
                   fixed_R=None, fixed_C=None):
    """Yield (chunk_start, chunk_end, (2, n_range, w) float16 predictions,
    labels-or-None) for one reader, reproducing save_predict's chunked
    sliding window (save_predict.py:137-219).  ``save_labels`` additionally
    emits the masked raw label map per chunk (the reference's save_labels
    config option, unwired in its snapshot — see DIVERGENCES.md).

    ``fixed_R``/``fixed_C`` (static_grid, multi-reader surveys): compile
    the grid at least this tall/wide so every reader of the survey shares
    one program (see ``static_grid_shape_for_reader``); outputs stay
    bit-identical — pad rows/columns are discarded on device/host exactly
    like this reader's own static pad.  (Semantically bit-identical:
    live patches see the same math on the same values, asserted bit-level
    on CPU.  On TPU hardware a chunk whose compiled sub-batch shape
    changes under padding tiles its convs differently, shifting
    probabilities at f16-ulp level — measured max |dprob| 2.9e-3 with
    write masks identical, scripts/static_grid_tpu.py.)"""
    wh, ww = runner.window
    o = runner.overlap
    sh, sw = runner.stride
    is_zarr = reader.data_format == "zarr"
    if is_zarr:
        n_pings, n_range = reader.shape
    else:
        n_range, n_pings = reader.shape

    from ..utils.preload_split import get_data_split
    chunk = preload_n_pings if preload_n_pings > 0 else 5000
    splits = get_data_split([[start_ping, n_pings]], chunk)

    seabed_full = np.asarray(reader.get_seabed(0, n_pings)).astype(np.int64)
    seabed_has = np.asarray(reader.seabed_known(0, n_pings))

    # static_grid: one compiled shape for every chunk — grid height from
    # the survey-max seabed, grid width from the widest chunk; prepare()
    # keeps the per-chunk reference grid (R_ref/C_ref) for the slab fill
    # extents and the dynamic row cutoff, so outputs are bit-identical
    static = bool(getattr(runner, "static_grid", False))
    R_fix = C_fix = 0
    if static and len(splits):
        R_fix, C_fix = static_grid_shape_for_reader(
            reader, runner.window, o, preload_n_pings, start_ping)
        R_fix = max(R_fix, int(fixed_R or 0))
        C_fix = max(C_fix, int(fixed_C or 0))

    it = splits
    if progress:
        from tqdm import tqdm
        it = tqdm(splits, desc="Predicting ...")

    # software pipeline: device dispatch is async; keep `pipeline_depth`
    # chunks in flight and only synchronize (d2h) that many chunks behind,
    # so the (async-started) transfer of chunk k overlaps compute of
    # chunks k+1..k+depth.  Each pending chunk holds one small float16
    # output (~4 MB at 1000x1000) on device — depth 3 is noise against
    # v5e HBM and rides out the tunnel's latency swings better than 2.
    pending: list = []
    pipeline_depth = int(getattr(runner, "pipeline_depth", 3))

    def _drain(entry):
        s0, e0, dev_out, dev_keep, lab = entry
        # non-overlapping attribution: time the wait-for-compute separately
        # from the actual transfer (VERDICT r1: the old d2h timer conflated
        # the two, making throughput unexplainable)
        runner.timer.start("device_wait")
        dev_out = jax.block_until_ready(dev_out)
        runner.timer.stop("device_wait")
        runner.timer.start("d2h")
        # dev_out arrives ALREADY cropped to the host-computed keep-row
        # bound (the all-zero rows below it never cross the tunnel's
        # slow d2h direction — _keep_row_bound) and async-copied since
        # dispatch; rebuild the full range on the host
        kr = min(dev_out.shape[1], n_range)
        host = np.zeros((2, n_range, e0 - s0), np.float16)
        if kr > 0:
            part = np.asarray(dev_out)[:, :kr, :e0 - s0]
            if part.dtype == np.uint8:
                # output_dtype='uint8': dequantize the d2h codes to the
                # f16 store values (code 0 -> 0.0, masked pixels stay 0)
                part = _U8_PROB_DEQUANT[part]
            host[:, :kr, :] = part
        runner.timer.stop("d2h")
        if lab is not None:
            # masked label export (save_labels): raw categorical labels
            # with the EXACT prediction exclusions — the device-computed
            # write mask, not `pred != 0` (f16 probabilities can
            # underflow to 0 inside the mask).  Rows at/below the crop
            # bound have keep identically False (the bound is a superset
            # of the kept set), so [:kr] covers every exportable pixel.
            keep = np.asarray(dev_keep)[:kr, :e0 - s0]
            # float32, NOT f16: the export carries RAW category codes
            # (4-digit LSSS codes like 6009 exceed f16's 2048 exact-int
            # range and would silently round)
            lab_full = np.zeros((n_range, e0 - s0), np.float32)
            lab_full[:kr] = np.where(
                keep, np.nan_to_num(lab[:kr, :e0 - s0], nan=0.0), 0.0)
            lab = lab_full
        return s0, e0, host, lab

    def prepare(s, e):
        """Host-side slab construction for one chunk (runs in a prefetch
        thread, overlapped with device compute of the previous chunk)."""
        s, e = int(s), int(e)
        w = e - s
        runner.timer.start("host_slab")
        sb_chunk = seabed_full[s:e]
        # R_ref/C_ref: the reference's per-chunk grid (extent law shared
        # with evaluate_reader via _grid_extent_rows).  Every data-bearing
        # extent below (slab fill, label read, row cutoff) derives from
        # them; under static_grid only the COMPILED shapes (R, C) grow to
        # the survey-wide fixed grid, with the pad rows/columns reading
        # zeros/NaN and discarded on device — outputs stay bit-identical.
        R_ref = _grid_extent_rows(n_range, sb_chunk, seabed_has[s:e], wh, o)
        C_ref = grid_dims(s, e, ww, o)
        row_cut = min(R_ref * sh, n_range)
        R = max(R_fix, R_ref) if static else R_ref
        C = max(C_fix, C_ref) if static else C_ref

        Hp = R * sh + 2 * o
        Wp = C * sw + 2 * o

        # data slab extents: reference preload (dataset.py:175-184) for
        # zarr; unclipped survey reads for memmap
        if is_zarr:
            first_center = s - o - 1 + ww // 2
            last_center = s + (C_ref - 1) * sw - o - 1 + ww // 2
            slab_x0 = max(0, first_center - ww // 2)
            slab_x1 = min(n_pings, last_center + ww // 2)
        else:
            slab_x0 = max(0, s - o)
            slab_x1 = min(n_pings, s + C_ref * sw + o)
        # fill to the REFERENCE grid's bottom data row even when the
        # compiled grid is taller (static_grid): slab-mode convolutions
        # read context below the kept rows, so filling deeper would
        # perturb kept outputs near the cutoff
        slab_y1 = min(n_range, R_ref * sh + o)

        # patches only ever read data columns [s - o, s + C_ref*sw + o);
        # clip the preload extents to that window (the reference's wider
        # slab columns are unreachable by any live patch, and static-grid
        # pad columns must read zeros, not data the reference never saw)
        slab_x0 = max(slab_x0, s - o)
        slab_x1 = min(slab_x1, s + C_ref * sw + o)

        # HWC layout: gathered patches come out NHWC with no device
        # relayout between the gather and the convs.  Only the
        # data-bearing rows [0, o + slab_y1) are allocated/filled/shipped
        # — the jit programs re-grow the zero pad rows on device
        # (GriddedRunner._pad_slab; bit-identical, and both the host fill
        # /cast work and the h2d bytes shrink by the pad fraction).
        # static_grid pins the shipped height too: a per-chunk slab_y1
        # would re-specialize the compiled programs per bathymetry bucket
        # — the exact churn static_grid exists to remove
        Hs = Hp if static else min(o + slab_y1, Hp)
        # bfloat16 transfer over a blosc zarr store: the native codec
        # decodes float32 chunks straight into a bfloat16 slab
        # (round-to-nearest-even in C, NaN/Inf preserved — chunkio
        # cvt=1), skipping the separate float32 slab + astype pass
        slab_dtype = np.float32
        if runner.transfer_dtype == "bfloat16" and is_zarr:
            from ..data import blosc_codec
            if blosc_codec.scatter_cvt_available():
                import ml_dtypes
                slab_dtype = ml_dtypes.bfloat16
        data_slab = np.zeros((Hs, Wp, len(runner.frequencies)), slab_dtype)
        x_off = o + (slab_x0 - s)
        runner.timer.start("host_fill")
        _fill_hwc_slab(reader, runner.frequencies, data_slab, slab_x0,
                       slab_x1, slab_y1, o, x_off)
        runner.timer.stop("host_fill")

        border_zero = not is_zarr
        if border_zero:
            # memm test transform zeroes dB data outside the data extent
            # (transforms.py:57-64); boundary-ness is geometric — ship
            # the 4-scalar data rectangle, the device builds the mask
            # from iota (the dense (Hp, Wp) float32 slab was ~5 MB/chunk)
            border_slab = np.array(
                [o, o + slab_y1, x_off, x_off + (slab_x1 - slab_x0)],
                np.int32)
        else:
            border_slab = np.zeros((1, 1), np.float32)

        # chunk-level mask inputs — only rows [0, nr) (the grid-covered
        # range) ever reach the device or the save_labels export; reading
        # the full range axis wasted ~(1 - nr/n_range) of the label I/O
        # and Blosc decode on deep recordings with shallow seabeds.
        # Under static_grid nr is pinned to the compiled grid height: a
        # per-reader min(..., n_range) would re-specialize _mask_output on
        # every distinct echogram height in a multi-reader survey — one
        # remote compile per reader, the exact churn static_grid exists to
        # remove.  Rows beyond n_range stay NaN-labelled (keep=False) and
        # are >= row_cut anyway; _drain crops them before host assembly.
        nr = R * sh if static else min(R * sh, n_range)
        # labels are only consulted for rows the reference grid keeps
        # ([0, row_cut)); static-grid pad rows stay NaN — never read from
        # disk — and are discarded by the device row cutoff anyway.
        runner.timer.start("host_label")
        label_pad = None
        if is_zarr:
            lab = reader.get_label_slice(s, w, 0, row_cut)  # (w, row_cut)
        else:
            lab = np.asarray(
                reader.label_memmap()[:row_cut, s:e]).astype(np.float32).T
        if save_labels:
            # the export needs the raw label map itself
            label_pad = np.full((nr, C * sw), np.nan, np.float32)
            label_pad[:row_cut, :w] = lab.T
            fin_pad = np.isfinite(label_pad)
            zero_pad = label_pad == 0
        else:
            # write-mask predicates only: evaluate them on the (ping,
            # range) layout (same float32 values — bit-identical
            # predicates) and transpose the 1-byte bool planes instead
            # of materializing + transposing the 4-byte label slab
            fin_pad = np.zeros((nr, C * sw), bool)
            zero_pad = np.zeros((nr, C * sw), bool)
            fin_pad[:row_cut, :w] = np.isfinite(lab).T
            zero_pad[:row_cut, :w] = (lab == 0).T
        runner.timer.stop("host_label")
        # raw-ch0 finiteness over the chunk (nan => excluded from write via
        # remove_nan_inf label marking in the preload path,
        # remove_nan_inf.py:22-33) is read on device from channel 0 of
        # the data slab inside _mask_output — no separate sv transfer
        sb_vec = np.full(C * sw, BIG_ROW, np.int64)
        sb_vec[:w] = np.where(seabed_has[s:e], sb_chunk, BIG_ROW)

        y0s, x0s = make_grid_starts(R, C, sh, sw, o, o, o)
        meta_slab = np.zeros((0, 1, 1), np.float32)
        consts = np.zeros((len(y0s), 0), np.float32)
        meta_full = np.zeros((1, 1, 0), np.float32)
        if runner.use_meta:
            if runner.infer_mode == "slab":
                meta_full = _build_meta_slab_full(
                    runner, reader, Hp, Wp, -o, s - o)
            else:
                centers_x = grid_center_cols(
                    s + np.tile(np.arange(C) * sw, R) - o, ww)
                meta_slab, consts = _build_meta_inputs(
                    runner, reader, Hp, Wp, -o, s - o, centers_x)
        runner.timer.stop("host_slab")

        # h2d from the prefetch thread (device_put is async), in bfloat16
        # by default: halves tunnel/PCIe bytes, and every consumer is
        # exactness-safe — the data slab feeds the bf16 U-Net after a
        # device-side dB transform (<=0.02 dB perturbation).
        # `transfer_dtype: float32` disables the quantization entirely
        # (used by the reference-parity harness, where the last f16 ulp
        # of the output probabilities matters).
        # Labels never ship at all: the write mask consults only
        # isfinite(label) and label==0, so those predicates are packed to
        # 1 bit/px here (computed on the exact float32 host labels —
        # bit-identical under every transfer_dtype) and unpacked on
        # device (_unpack_bits); 16x fewer label bytes than bf16.
        runner.timer.start("h2d_dispatch")
        import ml_dtypes
        bit_planes = [np.packbits(fin_pad, axis=1),
                      np.packbits(zero_pad, axis=1)]
        if runner.transfer_dtype == "uint8":
            # serving mode: dB-transform + 8-bit-quantize on the host (4x
            # fewer slab bytes than float32); channel-0 finiteness rides
            # as a packed bitmask since uint8 codes cannot carry NaN
            w2m = min(C * sw if static else w, C * sw)
            svf = np.ones((nr, C * sw), bool)
            avail = max(min(nr, Hs - o), 0)  # rows beyond are zeros: finite
            svf[:avail, :w2m] = np.isfinite(
                data_slab[o:o + avail, o:o + w2m, 0])
            bit_planes.append(np.packbits(svf, axis=1))
            slab_xfer = _quantize_db_u8(data_slab)
        else:
            xfer = np.dtype(runner.transfer_dtype) \
                if runner.transfer_dtype != "bfloat16" \
                else ml_dtypes.bfloat16
            # no-op when the native codec already decoded to bf16
            slab_xfer = data_slab if data_slab.dtype == xfer \
                else data_slab.astype(xfer)
        # one put for the packed predicate planes and one for
        # seabed+row_cut (the tunnel charges a dispatch fee per put);
        # grid indices and the empty meta placeholders are identical
        # across chunks — reuse their device buffers via the runner cache
        dev = dict(
            data_slab=jax.device_put(slab_xfer),
            border_slab=(jax.device_put(border_slab) if border_zero
                         else runner._cached_put(("border0",),
                                                 lambda: border_slab)),
            lab_bits=jax.device_put(np.stack(bit_planes)),
            sb_row=jax.device_put(np.append(sb_vec, np.int64(row_cut))),
            y0s=runner._cached_put(("y0s", R, C), lambda: y0s),
            x0s=runner._cached_put(("x0s", R, C), lambda: x0s),
            meta_slab=(jax.device_put(meta_slab) if meta_slab.size
                       else runner._cached_put(("meta0",),
                                               lambda: meta_slab)),
            consts=(jax.device_put(consts) if consts.size
                    else runner._cached_put(("consts0", len(y0s)),
                                            lambda: consts)),
            meta_full=(jax.device_put(meta_full) if meta_full.size
                       else runner._cached_put(("metaf0",),
                                               lambda: meta_full)))
        runner.timer.stop("h2d_dispatch")
        # host-computed d2h crop bound (see _keep_row_bound), bucketed to
        # 128-row multiples: the device slice compiles one tiny
        # executable per distinct shape, and an exact per-chunk bound
        # would churn compiles through the remote-compile tunnel
        kr = _keep_row_bound(fin_pad, zero_pad, sb_vec, row_cut, sh, o,
                             is_zarr, nr)
        kr = min(_round_up(kr, 128), nr)
        return (s, e, w, R, C, nr, kr, border_zero, dev,
                label_pad if save_labels else None)

    import collections
    from concurrent.futures import ThreadPoolExecutor
    executor = ThreadPoolExecutor(max_workers=2)
    try:
        futs = collections.deque(executor.submit(prepare, *sp)
                                 for sp in splits[:2])
        n_submitted = len(futs)

        for idx, _ in enumerate(it):
            (s, e, w, R, C, nr, kr, border_zero, dev, lab_host) = \
                futs.popleft().result()
            if n_submitted < len(splits):
                futs.append(executor.submit(prepare, *splits[n_submitted]))
                n_submitted += 1

            if runner.infer_mode != "slab":
                # MFU counter: slab mode forwards ONE whole-slab conv
                # (~1.9x fewer FLOPs), not R*C patches — counting the
                # grid here would overstate slab-mode utilization
                runner.patches_processed += int(dev["y0s"].shape[0])
            runner.timer.start("device_chunk")
            if runner.infer_mode == "slab":
                stitched = runner._predict_slab(
                    runner.variables, dev["data_slab"],
                    dev["border_slab"], dev["meta_full"], R, C,
                    border_zero, runner.use_meta)
            else:
                stitched = runner._predict_patches(
                    runner.variables,
                    dev["data_slab"], dev["y0s"], dev["x0s"],
                    dev["border_slab"], dev["meta_slab"], dev["consts"],
                    R, C, border_zero, runner.use_meta)
            # under static_grid chunk_w is pinned to the grid width so the
            # tail chunk shares the same compiled program; its pad columns
            # carry NaN labels (keep=False) and are cropped on the host
            out, keep_dev = runner._mask_output(
                stitched, dev["lab_bits"], dev["data_slab"],
                dev["sb_row"], nr, C * sw, is_zarr,
                C * sw if static else w)
            if kr < nr:
                # lossless d2h crop (host-computed bound, _keep_row_bound):
                # rows at/below kr are identically zero in `out`
                out = out[:, :kr, :]
            runner.timer.stop("device_chunk")
            # start the d2h copy as soon as compute finishes (overlaps the
            # next chunk's device work; _drain only synchronizes).  The
            # keep mask is only transferred when labels are exported.
            try:
                out.copy_to_host_async()
                if lab_host is not None:
                    keep_dev.copy_to_host_async()
            except AttributeError:
                # older jax arrays without copy_to_host_async: _drain's
                # np.asarray still performs the (synchronous) transfer.
                # Any OTHER error class must surface here, not be
                # silently deferred to _drain with no context.
                pass
            pending.append((s, e, out, keep_dev, lab_host))
            if len(pending) >= pipeline_depth:
                yield _drain(pending.pop(0))

        for entry in pending:
            yield _drain(entry)
    finally:
        # deterministic teardown: generator.close() (early abandonment)
        # must not leave prefetch threads staging chunks in the background
        executor.shutdown(wait=True, cancel_futures=True)


def _ping_chunk(preload_n_pings: int) -> int:
    """On-disk ping_time chunk width for prediction stores: follows
    preload_n_pings, capped at the reference's 1000-ping contract.  Any
    non-positive value means 'use the default chunking' — predict_reader
    treats <=0 as the 5000-ping default, and a raw max(1, ...) turned
    -1 into pathological 1-ping chunk files (review finding r3)."""
    return min(1000, preload_n_pings) if preload_n_pings > 0 else 1000


def save_survey_predictions_zarr(runner, reader, target_dname,
                                 preload_n_pings=1000, resume_writing=False,
                                 model_name="model", progress=False,
                                 save_labels=False, fixed_R=None,
                                 fixed_C=None):
    """Write chunked predictions to a ``<name>_pred.zarr`` store with the
    reference's on-disk contract (save_predict.py:87-134): annotation array
    (category [27, 1], ping_time, range) float16, full-range chunks,
    append along ping_time, resume from the existing ping count.
    ``save_labels`` adds a masked (ping_time, range) ``labels`` array.
    ``fixed_R``/``fixed_C``: survey-level static grid (see predict_reader)."""
    import os
    import shutil

    from ..data.zarrlite import ZGroup

    n_pings, n_range = reader.shape if reader.data_format == "zarr" else \
        (reader.shape[1], reader.shape[0])

    if not resume_writing:
        if os.path.isdir(target_dname):
            shutil.rmtree(target_dname)
        start_ping = 0
        group = None
    elif not os.path.isdir(target_dname):
        # resume over a survey whose previous run died mid-survey: later
        # readers have no store yet — treat each as a fresh start (the
        # memmap path and the reference's append writer both do; raising
        # here made survey-level resume impossible after a crash)
        start_ping = 0
        group = None
    else:
        group = ZGroup.open(target_dname)
        # save_labels must match the existing store: creating "labels"
        # mid-stream would misalign its rows with ping_time by
        # start_ping, and dropping it would strand a stale array
        if save_labels and "labels" not in group:
            raise ValueError(
                f"Cannot resume {target_dname} with save_labels=True: the "
                "existing store has no 'labels' array (it was written "
                "without save_labels)")
        if not save_labels and "labels" in group:
            raise ValueError(
                f"Cannot resume {target_dname} with save_labels=False: the "
                "existing store has a 'labels' array that would fall "
                "behind ping_time; pass save_labels=True")
        if save_labels and "labels" in group and \
                group["labels"].dtype == np.float16:
            # appends cast to the stored dtype: resuming a pre-f32 store
            # would silently round 4-digit category codes again
            raise ValueError(
                f"Cannot resume {target_dname}: its 'labels' array is "
                "float16 (written by an older version; codes above 2048 "
                "round silently) — re-run without resume_writing to "
                "rewrite the store at float32")
        # resume from the joint commit point: a crash between the
        # annotation append and the ping_time append leaves the arrays at
        # different lengths — truncate whichever ran ahead (zarrlite's
        # append is itself data-before-shape crash-consistent, so shapes
        # are trustworthy high-water marks)
        start_ping = min(group["annotation"].shape[1],
                         group["ping_time"].shape[0])
        if save_labels and "labels" in group:
            start_ping = min(start_ping, group["labels"].shape[0])
        if group["annotation"].shape[1] != start_ping:
            shp = list(group["annotation"].shape)
            shp[1] = start_ping
            group["annotation"].resize(shp)
        if group["ping_time"].shape[0] != start_ping:
            group["ping_time"].resize([start_ping])
        if save_labels and "labels" in group and \
                group["labels"].shape[0] != start_ping:
            shp = list(group["labels"].shape)
            shp[0] = start_ping
            group["labels"].resize(shp)

    def write_chunk(s, e, out, lab):
        nonlocal group
        runner.timer.start("zarr_write")
        pred = out.transpose(0, 2, 1)  # -> (category, ping, range)
        if group is None:
            group = ZGroup.create(
                target_dname,
                attrs={"description": f"{model_name} predictions"})
            group.create_array(
                "annotation", (2, 0, n_range),
                (1, _ping_chunk(preload_n_pings), n_range),
                np.float16, fill_value=0, dims=["category", "ping_time",
                                                "range"],
                # reference output codec: Blosc zstd-3 BITSHUFFLE
                # (save_predict.py:128); zlib when blosc is unavailable
                compressor="blosc-zstd")
            group.create_array("category", (2,), (2,), np.int64,
                               fill_value=None, compressor=None,
                               dims=["category"])[:] = np.array([27, 1])
            group.create_array("range", (n_range,), (n_range,), np.float64,
                               fill_value=None, compressor=None,
                               dims=["range"])[:] = \
                np.asarray(reader.range_vector)
            tv = np.asarray(reader.time_vector)
            group.create_array("ping_time", (0,), (8192,), tv.dtype,
                               fill_value=None, compressor=None,
                               dims=["ping_time"])
        if save_labels and "labels" not in group:
            group.create_array(
                "labels", (0, n_range),
                (_ping_chunk(preload_n_pings), n_range),
                # f32: raw category codes (this export's values — the
                # reference's own save_labels path is dead code, so the
                # semantics are ours) include 4-digit LSSS codes that
                # exceed f16's exact-integer range
                np.float32, fill_value=0, dims=["ping_time", "range"],
                compressor="blosc-zstd")
        group["annotation"].append(pred, axis=1)
        if save_labels and lab is not None:
            group["labels"].append(lab.T, axis=0)
        group["ping_time"].append(np.asarray(reader.time_vector[s:e]),
                                  axis=0)
        runner.timer.stop("zarr_write")

    # one ordered writer thread: the Blosc encode + file appends of chunk k
    # overlap the device/tunnel work of chunk k+1.  Ordering (appends MUST
    # be sequential along ping_time) is preserved by the single consumer;
    # crash-consistency is unchanged — write_chunk runs identically,
    # just off-thread.  A writer failure propagates on the next submit or
    # at drain, before any out-of-order append could happen.
    from concurrent.futures import ThreadPoolExecutor
    writer = ThreadPoolExecutor(max_workers=1)
    pending_write = None
    try:
        for s, e, out, lab in predict_reader(runner, reader,
                                             preload_n_pings, start_ping,
                                             progress,
                                             save_labels=save_labels,
                                             fixed_R=fixed_R,
                                             fixed_C=fixed_C):
            if pending_write is not None:
                pending_write.result()  # re-raises writer errors in order
            pending_write = writer.submit(write_chunk, s, e, out, lab)
        if pending_write is not None:
            pending_write.result()
    finally:
        writer.shutdown(wait=True)
    # complete write session -> snapshot consolidated metadata, as the
    # reference ecosystem's xarray-written stores carry (real-zarr
    # consumers open_consolidated); any append during the run dropped a
    # pre-existing snapshot, so a crash never leaves a stale one
    if group is not None:
        group.consolidate()
    return target_dname


def save_reader_predictions_memm(runner, reader, target_dname,
                                 preload_n_pings=1000, resume_writing=False,
                                 progress=False, fixed_R=None, fixed_C=None):
    """Memmap variant: accumulate into one (2, n_range, n_pings) array and
    save as .npy (save_predict.py:222-265; skips existing files when
    resuming).  ``fixed_R``/``fixed_C``: survey-level static grid (see
    predict_reader) — memm surveys run one file per echogram, so without
    them static_grid still compiled one program per echogram."""
    import os
    if resume_writing and os.path.isfile(target_dname):
        return target_dname
    n_range, n_pings = reader.shape
    out = np.zeros((2, n_range, n_pings), np.float16)
    for s, e, chunk, _ in predict_reader(runner, reader, preload_n_pings, 0,
                                         progress, fixed_R=fixed_R,
                                         fixed_C=fixed_C):
        out[:, :, s:e] = chunk
    np.save(target_dname, out)
    return target_dname
