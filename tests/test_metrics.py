"""Histogram PR curve vs sklearn on float16 scores."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import precision_recall_curve

from crimac_unet_tpu.constants import SANDEEL
from crimac_unet_tpu.ops import metrics
from crimac_unet_tpu.ops.label_ops import set_label_ignore_val


def _reference_filter(labels, preds):
    """The reference's numpy filtering (pipeline.py:305-321, 297-303)."""
    labels = labels.copy()
    preds = preds.copy()
    preds[labels == -50] = 0
    for v in (-70, -30, -100, -10):
        labels[labels == v] = -100
    labels[labels == -50] = 0
    keep = labels != -100
    return labels[keep], preds[keep]


def test_pr_curve_matches_sklearn(rng):
    n = 20000
    preds = rng.beta(0.3, 3.0, size=n).astype(np.float16)
    labels = rng.choice([0, 1, 2, -10, -30, -50, -70, -100], size=n,
                        p=[.5, .1, .1, .05, .05, .1, .05, .05]).astype(np.int32)

    hist = metrics.new_histogram()
    # accumulate in several batches to exercise streaming
    for i in range(0, n, 4096):
        hist = metrics.update_pr_histogram(
            hist, jnp.asarray(preds[i:i + 4096].astype(np.float32)),
            jnp.asarray(labels[i:i + 4096]))
    got = metrics.pr_curve_from_histogram(np.asarray(hist))

    lab_f, pred_f = _reference_filter(labels, preds)
    prec, rec, thr = precision_recall_curve(lab_f, pred_f,
                                            pos_label=SANDEEL)

    np.testing.assert_allclose(got["precision"], prec, atol=1e-12)
    np.testing.assert_allclose(got["recall"], rec, atol=1e-12)
    np.testing.assert_allclose(got["thresholds"],
                               thr.astype(np.float64), atol=0)

    # reference F1 computation (pipeline.py:284-295)
    numerator = 2 * rec * prec
    denom = rec + prec
    f1 = np.divide(numerator, denom, out=np.zeros_like(denom),
                   where=denom != 0)
    np.testing.assert_allclose(got["F1"], f1, atol=1e-12)
    assert abs(metrics.max_f1(got)[0] - f1.max()) < 1e-12


def test_pr_curve_no_positives(rng):
    preds = rng.rand(100).astype(np.float16)
    labels = np.zeros(100, dtype=np.int32)
    hist = metrics.update_pr_histogram(metrics.new_histogram(),
                                       jnp.asarray(preds.astype(np.float32)),
                                       jnp.asarray(labels))
    got = metrics.pr_curve_from_histogram(np.asarray(hist))
    assert np.all(got["recall"][:-1] == 1.0)
    assert np.all(got["precision"][:-1] == 0.0)


def test_histogram_counts(rng):
    preds = np.array([0.0, 0.5, 1.0, 0.5], dtype=np.float32)
    labels = np.array([1, 1, 0, 2], dtype=np.int32)
    hist = np.asarray(metrics.update_pr_histogram(
        metrics.new_histogram(), jnp.asarray(preds), jnp.asarray(labels)))
    assert hist.sum() == 4
    half_bin = np.float16(0.5).view(np.uint16)
    one_bin = np.float16(1.0).view(np.uint16)
    assert hist[0, 0] == 1          # pred 0.0, label 1
    assert hist[0, half_bin] == 1   # pred 0.5, label 1
    assert hist[1, half_bin] == 1   # pred 0.5, label 2 -> negative
    assert hist[1, one_bin] == 1    # pred 1.0, label 0 -> negative


def test_histogram_impls_bit_equal(rng):
    """All three histogram formulations — scatter-add, sort+searchsorted,
    and the r5 one-hot-matmul (TPU default; exact 0/1 products, f32
    integer accumulation) — must agree bit-for-bit on every input
    class."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.ops import metrics as M

    preds = jnp.asarray(rng.rand(7, 64, 64).astype(np.float32))
    labels = jnp.asarray(rng.choice(
        [0, 1, 2, -100, -50, -1], size=(7, 64, 64)).astype(np.int32))
    h0 = M.new_histogram()
    outs = {}
    for impl in ("scatter", "sort", "matmul"):
        outs[impl] = np.asarray(jax.jit(
            lambda h, p, l, i=impl: M.update_pr_histogram(h, p, l,
                                                          impl=i))(
                h0, preds, labels))
    assert np.array_equal(outs["scatter"], outs["sort"])
    assert np.array_equal(outs["scatter"], outs["matmul"])
    assert outs["scatter"].sum() == int(
        np.isin(np.asarray(labels), [0, 1, 2, -50, -1]).sum())
    # edge bins: pred exactly 1.0 lands in the LAST bin (15360 = 120*128
    # + 0 -> the matmul's 121st high-group), pred 0.0 in bin 0
    preds2 = jnp.asarray(np.array([[[0.0, 1.0]]], np.float32))
    labels2 = jnp.asarray(np.array([[[1, 1]]], np.int32))
    for impl in ("scatter", "matmul"):
        h = np.asarray(M.update_pr_histogram(M.new_histogram(), preds2,
                                             labels2, impl=impl))
        assert h[0, 0] == 1 and h[0, M.N_F16_BINS - 1] == 1
