"""Label sentinel algebra as batched, jittable device ops.

The reference applies these per patch in DataLoader worker processes
(crimac_unet/batch/label_transforms/*); here they are fused XLA programs over
whole batches.  Semantics are bit-matched against numpy oracles in
tests/test_ops.py.

Layout convention: labels (B, H, W) int32, data (B, C, H, W) float32 in raw
(pre-dB) units, H = range rows, W = ping columns.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import (BACKGROUND, LABEL_BOUNDARY_VAL, LABEL_IGNORE_VAL,
                         LABEL_OVERLAP_VAL, LABEL_REFINE_BOUNDARY_VAL,
                         LABEL_SEABED_MASK_VAL, LABEL_UNUSED_SPECIES, OTHER,
                         RAW_OTHER, RAW_SANDEEL, SANDEEL)
from .morphology import DISC_7X7, binary_closing

BIG_ROW = 10 ** 8  # "no seabed in this column" sentinel for seabed vectors

# refine_label_boundary's raw-sv acceptance band (reference
# refine_label_boundary.py:24: 200 kHz sv inside (lo, hi) keeps the
# label).  Shared with the host-side predicate builder for
# quantized-transfer eval (pipeline/inference.py) so the two can't drift.
REFINE_THRESHOLD_LO = 1e-7
REFINE_THRESHOLD_HI = 1e-4

# None = auto (Pallas kernel on TPU, XLA convs elsewhere); set True/False to
# force an implementation. The scipy-oracle tests exercise whichever
# backend the platform selects (conv on the CPU suite, Pallas under
# CRIMAC_TEST_TPU=1) and tests/test_pallas_morphology.py pins the two
# implementations against each other.
# CAVEAT: the flag is read at TRACE time inside jitted consumers
# (refine_label_boundary), so it must be set BEFORE the first call for a
# given shape — toggling later is ignored for already-compiled shapes
# (clear caches with jax.clear_caches() to re-trace).
USE_PALLAS_MORPHOLOGY: bool | None = None


def use_pallas_morphology() -> bool:
    if USE_PALLAS_MORPHOLOGY is not None:
        return USE_PALLAS_MORPHOLOGY
    return jax.default_backend() == "tpu"


def convert_label_indexing(labels: jnp.ndarray,
                           mark_unused_species: bool = False) -> jnp.ndarray:
    """Raw species codes {0, 27, 1} -> {0, 1, 2}; everything else IGNORE
    (or UNUSED_SPECIES for positive non-target codes when requested)
    (reference convert_label_indexing.py:24-47)."""
    out = jnp.full_like(labels, LABEL_IGNORE_VAL)
    out = jnp.where(labels == 0, BACKGROUND, out)
    out = jnp.where(labels == RAW_SANDEEL, SANDEEL, out)
    out = jnp.where(labels == RAW_OTHER, OTHER, out)
    if mark_unused_species:
        unused = (labels > 0) & (labels != RAW_OTHER) & (labels != RAW_SANDEEL)
        out = jnp.where(unused, LABEL_UNUSED_SPECIES, out)
    return out


def _valid_bbox_mask(valid: jnp.ndarray) -> jnp.ndarray:
    """Per-sample bounding-box mask of the True region of ``valid`` (B,H,W).

    Replicates ``np.argwhere(...).min/max`` cropping
    (refine_label_boundary.py:85-96) without dynamic shapes."""
    B, H, W = valid.shape
    rows_any = jnp.any(valid, axis=2)  # (B, H)
    cols_any = jnp.any(valid, axis=1)  # (B, W)
    y0 = jnp.argmax(rows_any, axis=1)
    y1 = H - jnp.argmax(rows_any[:, ::-1], axis=1)
    x0 = jnp.argmax(cols_any, axis=1)
    x1 = W - jnp.argmax(cols_any[:, ::-1], axis=1)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    return ((rows >= y0[:, None, None]) & (rows < y1[:, None, None])
            & (cols >= x0[:, None, None]) & (cols < x1[:, None, None]))


@partial(jax.jit, static_argnames=("threshold_freq_idx", "channels_last"))
def refine_label_boundary(data: jnp.ndarray, labels: jnp.ndarray,
                          threshold_freq_idx: int = -1,
                          threshold_lo: float = REFINE_THRESHOLD_LO,
                          threshold_hi: float = REFINE_THRESHOLD_HI,
                          channels_last: bool = False,
                          threshold_mask: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """Inside labelled regions, mark pixels whose high-frequency sv falls
    outside [lo, hi] (after 7x7-disc binary closing of the in-threshold mask)
    as LABEL_REFINE_BOUNDARY_VAL (reference refine_label_boundary.py:24-104).

    The closing is confined to each patch's non-boundary bbox, matching the
    reference's crop-then-close (scipy zero border at the crop edge).
    Patches that are entirely boundary are passed through unchanged
    (the reference's empty-patch guard, :78-84).

    ``threshold_mask`` (B, H, W bool), when given, replaces the
    ``lo < data[threshold_freq] < hi`` term: quantized-transfer eval
    (transfer_dtype bfloat16/uint8) computes the predicate on the host
    from the exact float32 sv, so the label chain stays bit-identical to
    the float32 path while the network-input slab ships quantized.
    """
    # (B, H, W) threshold channel; channels_last supports NHWC patch
    # batches (the TPU-preferred gather layout) without a relayout
    valid = labels != LABEL_BOUNDARY_VAL
    any_valid = jnp.any(valid, axis=(1, 2), keepdims=True)

    crop_mask = _valid_bbox_mask(valid)
    if threshold_mask is None:
        d = data[..., threshold_freq_idx] if channels_last \
            else data[:, threshold_freq_idx]
        threshold_mask = (d > threshold_lo) & (d < threshold_hi)
    mask_threshold = (labels > 0) & threshold_mask
    if use_pallas_morphology():
        from .pallas_morphology import binary_closing_pallas
        closed = binary_closing_pallas(mask_threshold, crop_mask)
    else:
        closed = binary_closing(mask_threshold, DISC_7X7,
                                clip_mask=crop_mask)

    relabel = (~closed) & (labels > 0) & crop_mask
    out = jnp.where(relabel, LABEL_REFINE_BOUNDARY_VAL, labels)
    # deliberate no-op kept for parity: mirrors the reference's own dead
    # re-assert (refine_label_boundary.py:103) — relabel requires
    # labels > 0, so IGNORE pixels already carry their original value
    out = jnp.where(labels == LABEL_IGNORE_VAL, LABEL_IGNORE_VAL, out)
    return jnp.where(any_valid, out, labels)


def mask_label_seabed(labels: jnp.ndarray, seabed_row: jnp.ndarray
                      ) -> jnp.ndarray:
    """BACKGROUND pixels at/below the padded seabed line -> SEABED sentinel
    (reference mask_label_seabed.py:24-68).

    ``seabed_row`` (B, W) int32: patch-row of the first below-seabed pixel
    per ping column, already including the +10 pad and the patch offset;
    columns outside the data (or without a seabed) carry BIG_ROW.  Built by
    the host dataset from the reader's per-ping seabed vector.
    """
    B, H, W = labels.shape
    rows = jnp.arange(H)[None, :, None]
    below = rows >= seabed_row[:, None, :]
    return jnp.where(below & (labels == BACKGROUND),
                     LABEL_SEABED_MASK_VAL, labels)


def mask_label_overlap(labels: jnp.ndarray, overlap: int) -> jnp.ndarray:
    """Frame of ``overlap`` pixels -> OVERLAP sentinel; BOUNDARY wins
    (reference mask_label_overlap.py:23-48)."""
    if overlap == 0:
        return labels
    B, H, W = labels.shape
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    interior = ((rows >= overlap) & (rows < H - overlap)
                & (cols >= overlap) & (cols < W - overlap))
    out = jnp.where(interior, labels, LABEL_OVERLAP_VAL)
    return jnp.where(labels == LABEL_BOUNDARY_VAL, LABEL_BOUNDARY_VAL, out)


def set_label_ignore_val(labels: jnp.ndarray) -> jnp.ndarray:
    """Collapse {OVERLAP, REFINE, BOUNDARY, UNUSED} -> IGNORE and
    SEABED -> BACKGROUND before loss / metric computation
    (reference pipeline.py:222-239)."""
    out = jnp.where((labels == LABEL_OVERLAP_VAL)
                    | (labels == LABEL_REFINE_BOUNDARY_VAL)
                    | (labels == LABEL_BOUNDARY_VAL)
                    | (labels == LABEL_UNUSED_SPECIES),
                    LABEL_IGNORE_VAL, labels)
    return jnp.where(out == LABEL_SEABED_MASK_VAL, BACKGROUND, out)
