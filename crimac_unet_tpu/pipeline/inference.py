"""Sliding-window survey inference and evaluation on device.

Replaces the reference's per-patch host pipeline
(save_predict.py:137-265, evaluate.py:39-117, batch/dataset.py:116-242)
with a slab-based TPU pipeline:

  host:   one raw slab per ping chunk (+ labels + seabed vector)
  device: patch gather (vmapped dynamic_slice) -> fused preprocessing ->
          U-Net forward (lax.map over fixed sub-batches) -> softmax ->
          reshape-stitch + masks (predict) or label chain + PR histogram
          (eval)
  host:   one small d2h per chunk -> zarr append / histogram accumulate

Parity notes (derived from the reference call stacks, SURVEY.md §3.2/3.3):
  * predict grid is per chunk with labels clipped to the chunk; data comes
    from the preload slab extents (dataset.py:164-184), so patch data can
    cross chunk edges but writes cannot;
  * the write mask reduces to
      finite(sv ch0) & finite(raw label) & within chunk/survey
      & not (raw label == 0 & row >= seabed+10)
    because refine(-30)/unused(-10) pixels are still written
    (save_predict.py:41-65) — the per-patch morphology drops out of the
    save path entirely;
  * eval reads labels without chunk clipping (evaluate.py uses per-patch
    global reads) and runs the full test label chain per patch, including
    the region/trace keep masks with the reference's ignore_val=-1 (pixels
    outside regions become PR-curve negatives — a reference quirk kept for
    metric parity, extend_label_masks.py:47).
"""

from __future__ import annotations

# Stable import facade: the implementation is split across
# infer_common.py (quantization laws, slab/grid helpers),
# runner.py (GriddedRunner device programs + metadata builders),
# predict.py (chunked predict loop + zarr/memmap writers) and
# eval_gridded.py (PR-histogram eval loop + keep masks).  Every name the
# tests, scripts and downstream modules historically imported from
# ``pipeline.inference`` is re-exported here unchanged.
from .infer_common import (DB_U8_SCALE, _U8_PROB_DEQUANT,  # noqa: F401
                           _convert_labels_host, _fill_hwc_slab,
                           _grid_extent_rows, _net_db_input,
                           _quantize_db_u8, _quantize_prob_u8, _round_up,
                           _unpack_bits, grid_center_cols,
                           grid_height_for_reader)
from .runner import (GriddedRunner, _build_meta_inputs,  # noqa: F401
                     _build_meta_slab_full)
from .predict import (_ping_chunk, predict_reader,  # noqa: F401
                      save_reader_predictions_memm,
                      save_survey_predictions_zarr,
                      static_grid_shape_for_reader)
from .eval_gridded import _build_keep_mask, evaluate_reader  # noqa: F401

__all__ = [
    "DB_U8_SCALE", "GriddedRunner", "evaluate_reader",
    "grid_center_cols", "grid_height_for_reader", "predict_reader",
    "save_reader_predictions_memm", "save_survey_predictions_zarr",
    "static_grid_shape_for_reader",
]
