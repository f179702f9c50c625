"""Streaming PR-curve metrics via exact float16 histograms.

The reference flattens every validation pixel into host RAM and runs
``sklearn.metrics.precision_recall_curve`` over ~1e8 float16 scores
(pipeline.py:242-295) — a host memory + compute hot spot.  Because the
collected scores are float16-quantized probabilities in [0, 1], there are at
most 15361 distinct values (uint16 bit patterns 0x0000..0x3C00, monotone in
value for non-negative float16).  A two-row histogram over those bit
patterns is therefore a *lossless* sufficient statistic: the PR curve
computed from it is bit-identical to sklearn's on the same float16 scores.

The histogram update runs on device (one scatter-add per batch, reducible
across the mesh with a psum); the tiny curve construction runs on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (LABEL_IGNORE_VAL, LABEL_SEABED_MASK_VAL, SANDEEL)
from .label_ops import set_label_ignore_val

# float16 values in [0, 1]: bit patterns 0 .. 0x3C00 (= 15360)
N_F16_BINS = 15361

# bin index -> float16 value (host-side)
F16_BIN_VALUES = np.arange(N_F16_BINS, dtype=np.uint16).view(np.float16)


def f16_bits(preds: jnp.ndarray) -> jnp.ndarray:
    """float -> float16 -> uint16 bit pattern (monotone for preds >= 0)."""
    return jax.lax.bitcast_convert_type(
        preds.astype(jnp.float16), jnp.uint16).astype(jnp.int32)


def new_histogram() -> jnp.ndarray:
    """(2, N_F16_BINS) int32: row 0 = positives (sandeel), row 1 = negatives."""
    return jnp.zeros((2, N_F16_BINS), dtype=jnp.int32)


def update_pr_histogram(hist: jnp.ndarray, preds: jnp.ndarray,
                        labels: jnp.ndarray, impl: str | None = None
                        ) -> jnp.ndarray:
    """Accumulate a batch of sandeel probabilities + sentinel labels.

    Reproduces the reference's validation filtering
    (pipeline.py:305-321, :297-303): sandeel probability is zeroed below the
    seabed, sentinels are collapsed via ``set_label_ignore_val``, and IGNORE
    pixels are dropped.  ``preds``: (...,) sandeel probabilities;
    ``labels``: (...,) int sentinel labels (pre-collapse).

    Three exactly-equivalent implementations (tests assert bit-equality):
    ``scatter`` (one scatter-add per class row), ``sort`` (pack
    bin+class into one key, sort, count bins via searchsorted edges) and
    ``matmul`` (two-level histogram as one-hot contractions on the MXU:
    bins split into 128*121, counts = onehot_hi^T @ onehot_lo with f32
    accumulation — every product is an exact 0/1 and chunk counts stay
    far below f32's 2^24 integer range, so counts are bit-exact).  On
    TPU the scatter-add serializes and costs as much as the whole U-Net
    forward on the same batch; ``sort`` beats it 1.6x and REMAINS the
    TPU default: the r5 profiler showed sort's searchsorted (a 21-step
    binary-search gather chain) costs ~8-15 ms per chunk, and the
    matmul form was built to replace it on the MXU — but measured
    SLOWER standalone (13.3 vs 8.5 ms per 1.6M px, burst-amortized on
    the chip): XLA materializes the (N,121)/(N,128) one-hot operands
    (~750 MB of traffic) instead of fusing the iota-compares into the
    dot.  Kept as a third bit-equal implementation and a recorded
    negative (docs/SESSIONS.md round 5).  ``scatter``
    stays the default elsewhere (CPU scatter is cheap; and under a sharded
    batch it needs no key all-gather).
    """
    preds = jnp.where(labels == LABEL_SEABED_MASK_VAL, 0.0,
                      preds.astype(jnp.float32))
    collapsed = set_label_ignore_val(labels)
    valid = (collapsed != LABEL_IGNORE_VAL).ravel()
    pos = (collapsed == SANDEEL).ravel()
    bits = f16_bits(preds).ravel()

    if impl is None:
        impl = "sort" if jax.default_backend() == "tpu" else "scatter"
    if impl == "sort":
        # invalid pixels -> sentinel key beyond every real (bin, class)
        key = jnp.where(valid, bits * 2 + pos.astype(jnp.int32),
                        2 * N_F16_BINS)
        skey = jnp.sort(key)
        edges = jnp.searchsorted(skey, jnp.arange(2 * N_F16_BINS + 1))
        counts = jnp.diff(edges).reshape(N_F16_BINS, 2)
        return hist + jnp.stack(
            [counts[:, 1], counts[:, 0]]).astype(jnp.int32)
    if impl == "matmul":
        LO = 128                             # one full lane tile
        n_hi = (N_F16_BINS + LO - 1) // LO   # 121
        hi = bits // LO
        lo = bits % LO
        oh_hi = (hi[:, None] ==
                 jnp.arange(n_hi, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)      # (N, 121) exact 0/1
        oh_lo = (lo[:, None] ==
                 jnp.arange(LO, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)      # (N, 128)
        vpos = (valid & pos).astype(jnp.bfloat16)[:, None]
        vneg = (valid & ~pos).astype(jnp.bfloat16)[:, None]
        # counts[h, l] = sum_i mask_i * [hi_i == h] * [lo_i == l]:
        # exact 0/1 products, f32 accumulation (chunk pixel counts are
        # far below f32's 2^24 exact-integer range)
        h_pos = jax.lax.dot_general(
            oh_hi * vpos, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h_neg = jax.lax.dot_general(
            oh_hi * vneg, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        flat = jnp.stack([h_pos.reshape(-1)[:N_F16_BINS],
                          h_neg.reshape(-1)[:N_F16_BINS]])
        return hist + flat.astype(jnp.int32)

    hist = hist.at[0, bits].add((valid & pos).astype(jnp.int32))
    hist = hist.at[1, bits].add((valid & ~pos).astype(jnp.int32))
    return hist


def pr_curve_from_histogram(hist: np.ndarray) -> dict:
    """Build the sklearn-identical PR curve from the histogram (host side).

    Matches ``sklearn.metrics.precision_recall_curve(y_true, probas_pred,
    pos_label=SANDEEL)`` followed by the reference's F1 computation
    (pipeline.py:284-295): thresholds ascending over distinct score values,
    appended (precision=1, recall=0) end point.

    Version note: bit-identical to MODERN sklearn (>=1.x, the installed
    and executed-parity environment). The reference's pinned
    scikit-learn==0.24.1 additionally truncated the curve at the first
    full-recall threshold (``last_ind = tps.searchsorted(tps[-1])``) and
    returned NaN recall with zero positives — the truncated tail holds
    recall==1 entries whose precision (and F1) are below the kept
    boundary entry, so max-F1/best-threshold are unaffected; only the
    CSV/plot tail length differs (documented in DIVERGENCES.md).
    """
    hist = np.asarray(hist)
    pos, neg = hist[0].astype(np.int64), hist[1].astype(np.int64)
    present = (pos + neg) > 0
    bins = np.nonzero(present)[0]
    thresholds = F16_BIN_VALUES[bins].astype(np.float16)

    # tps/fps at threshold t = counts with score >= t (reverse cumsum)
    tps = np.cumsum(pos[bins][::-1])[::-1]
    fps = np.cumsum(neg[bins][::-1])[::-1]

    ps = tps + fps
    precision = np.divide(tps, ps, out=np.zeros(len(ps)), where=ps != 0)
    if len(tps) == 0 or tps[0] == 0:  # no positives anywhere
        recall = np.ones(len(tps))
    else:
        recall = tps / tps[0]

    precision = np.concatenate([precision, [1.0]])
    recall = np.concatenate([recall, [0.0]])

    numerator = 2 * recall * precision
    denom = recall + precision
    f1 = np.divide(numerator, denom, out=np.zeros_like(denom),
                   where=denom != 0)
    return {"precision": precision, "recall": recall,
            "thresholds": thresholds.astype(np.float64), "F1": f1}


def max_f1(metrics: dict) -> tuple:
    f1 = metrics["F1"]
    idx = int(np.argmax(f1))
    return float(f1[idx]), idx
