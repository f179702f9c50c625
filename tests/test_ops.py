"""Device ops vs numpy/scipy oracles implementing the reference semantics."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from crimac_unet_tpu.constants import (BACKGROUND, LABEL_BOUNDARY_VAL,
                                       LABEL_IGNORE_VAL, LABEL_OVERLAP_VAL,
                                       LABEL_REFINE_BOUNDARY_VAL,
                                       LABEL_SEABED_MASK_VAL,
                                       LABEL_UNUSED_SPECIES)
from crimac_unet_tpu.ops import augment, data_ops, label_ops, morphology


# --------------------------------------------------------------- morphology
def test_binary_closing_matches_scipy(rng):
    masks = rng.rand(6, 40, 48) > 0.75
    got = np.asarray(morphology.binary_closing(jnp.asarray(masks)))
    disc = morphology.DISC_7X7.astype(bool)
    for i in range(masks.shape[0]):
        want = ndi.binary_closing(masks[i], structure=disc)
        np.testing.assert_array_equal(got[i], want, err_msg=f"sample {i}")


def test_binary_dilation_erosion_match_scipy(rng):
    masks = rng.rand(4, 33, 29) > 0.6
    disc = morphology.DISC_7X7.astype(bool)
    got_d = np.asarray(morphology.binary_dilation(jnp.asarray(masks)))
    got_e = np.asarray(morphology.binary_erosion(jnp.asarray(masks)))
    for i in range(masks.shape[0]):
        np.testing.assert_array_equal(
            got_d[i], ndi.binary_dilation(masks[i], structure=disc))
        np.testing.assert_array_equal(
            got_e[i], ndi.binary_erosion(masks[i], structure=disc))


# ------------------------------------------------------------ label algebra
def _oracle_convert(labels, mark_unused):
    new = np.full(labels.shape, LABEL_IGNORE_VAL, dtype=labels.dtype)
    new[labels == 0] = 0
    new[labels == 27] = 1
    new[labels == 1] = 2
    if mark_unused:
        new[(labels > 0) & (labels != 1) & (labels != 27)] = \
            LABEL_UNUSED_SPECIES
    return new


@pytest.mark.parametrize("mark_unused", [False, True])
def test_convert_label_indexing(rng, mark_unused):
    labels = rng.choice([0, 1, 27, 6, 5, -100], size=(3, 32, 32)).astype(
        np.int32)
    got = np.asarray(label_ops.convert_label_indexing(
        jnp.asarray(labels), mark_unused_species=mark_unused))
    np.testing.assert_array_equal(got, _oracle_convert(labels, mark_unused))


def _oracle_refine(data, labels):
    """Numpy oracle of refine_label_boundary (reference
    refine_label_boundary.py:60-104): crop to non-boundary bbox, threshold
    200 kHz channel, scipy binary closing on the crop, relabel."""
    d = data[-1]
    new = labels.copy()
    idxs = np.argwhere(new != LABEL_BOUNDARY_VAL)
    if len(idxs) == 0:
        return new
    y0, x0 = idxs.min(axis=0)
    y1, x1 = idxs.max(axis=0) + 1
    relevant = new[y0:y1, x0:x1]
    mask_thr = (labels > 0) & (d > 1e-7) & (d < 1e-4)
    closed = ndi.binary_closing(mask_thr[y0:y1, x0:x1],
                                structure=morphology.DISC_7X7.astype(bool))
    mask = np.zeros_like(new, dtype=bool)
    mask[y0:y1, x0:x1] = (closed == 0) & (relevant > 0)
    new[mask] = LABEL_REFINE_BOUNDARY_VAL
    new[labels == LABEL_IGNORE_VAL] = LABEL_IGNORE_VAL
    return new


def _random_refine_case(rng, H=64, W=64, C=4, boundary="none"):
    data = rng.lognormal(np.log(1e-6), 2.0, size=(C, H, W)).astype(np.float32)
    labels = np.zeros((H, W), dtype=np.int32)
    for _ in range(3):
        y, x = rng.randint(0, H - 12), rng.randint(0, W - 12)
        labels[y:y + rng.randint(4, 12), x:x + rng.randint(4, 12)] = \
            rng.choice([1, 2])
    if boundary == "frame":
        labels[:7, :] = LABEL_BOUNDARY_VAL
        labels[:, -13:] = LABEL_BOUNDARY_VAL
    elif boundary == "all":
        labels[:, :] = LABEL_BOUNDARY_VAL
    return data, labels


@pytest.mark.parametrize("boundary", ["none", "frame", "all"])
def test_refine_label_boundary(rng, boundary):
    cases = [_random_refine_case(rng, boundary=boundary) for _ in range(4)]
    data = jnp.asarray(np.stack([c[0] for c in cases]))
    labels = jnp.asarray(np.stack([c[1] for c in cases]))
    got = np.asarray(label_ops.refine_label_boundary(data, labels))
    for i, (d, l) in enumerate(cases):
        np.testing.assert_array_equal(got[i], _oracle_refine(d, l),
                                      err_msg=f"sample {i} ({boundary})")


def test_mask_label_overlap(rng):
    labels = rng.choice([0, 1, 2, LABEL_BOUNDARY_VAL],
                        size=(2, 40, 40)).astype(np.int32)
    got = np.asarray(label_ops.mask_label_overlap(jnp.asarray(labels), 5))
    for i in range(2):
        want = np.full_like(labels[i], LABEL_OVERLAP_VAL)
        want[5:-5, 5:-5] = labels[i][5:-5, 5:-5]
        want[labels[i] == LABEL_BOUNDARY_VAL] = LABEL_BOUNDARY_VAL
        np.testing.assert_array_equal(got[i], want)
    # overlap=0 is the identity (reference mask_label_overlap.py:36-38)
    np.testing.assert_array_equal(
        np.asarray(label_ops.mask_label_overlap(jnp.asarray(labels), 0)),
        labels)


def test_mask_label_seabed():
    H, W = 16, 8
    labels = np.zeros((1, H, W), dtype=np.int32)
    labels[0, :, 3] = 2          # fish column: protected from seabed mask
    labels[0, 2, :] = LABEL_BOUNDARY_VAL
    seabed_row = np.full((1, W), 6, dtype=np.int32)
    seabed_row[0, 5] = label_ops.BIG_ROW  # column outside data
    got = np.asarray(label_ops.mask_label_seabed(
        jnp.asarray(labels), jnp.asarray(seabed_row)))
    want = labels[0].copy()
    for x in range(W):
        if x == 5:
            continue
        for y in range(6, H):
            if want[y, x] == BACKGROUND:
                want[y, x] = LABEL_SEABED_MASK_VAL
    np.testing.assert_array_equal(got[0], want)


def test_set_label_ignore_val(rng):
    labels = rng.choice([0, 1, 2, -10, -30, -50, -70, -100],
                        size=(2, 10, 10)).astype(np.int32)
    got = np.asarray(label_ops.set_label_ignore_val(jnp.asarray(labels)))
    want = labels.copy()
    for v in (-70, -30, -100, -10):
        want[labels == v] = LABEL_IGNORE_VAL
    want[labels == -50] = 0
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------- data plane
def test_data_transform_train_oracle(rng):
    data = rng.lognormal(np.log(1e-6), 2.0, size=(2, 4, 16, 16)).astype(
        np.float32)
    data[0, 0, 3, 4] = np.nan
    data[1, 2, 5, 5] = np.inf
    labels = np.zeros((2, 16, 16), dtype=np.int32)
    d, l = data_ops.data_transform_train(jnp.asarray(data),
                                         jnp.asarray(labels))
    # oracle (reference remove_nan_inf.py + db_with_limits.py)
    want_l = labels.copy()
    want_l[~np.isfinite(data[:, 0])] = LABEL_IGNORE_VAL
    want_d = data.copy()
    want_d[~np.isfinite(want_d)] = 0.0
    want_d = 10 * np.log10(want_d + 1e-10)
    want_d = np.clip(want_d, -75, 0)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(l), want_l)


def test_data_transform_test_border(rng):
    data = rng.lognormal(np.log(1e-6), 1.0, size=(1, 4, 8, 8)).astype(
        np.float32)
    labels = np.zeros((1, 8, 8), dtype=np.int32)
    labels[0, :2, :] = LABEL_BOUNDARY_VAL
    d, _ = data_ops.data_transform_test(jnp.asarray(data),
                                        jnp.asarray(labels))
    # boundary pixels are 0.0 *in dB space* (reference transforms.py:57-64)
    assert np.all(np.asarray(d)[0, :, :2, :] == 0.0)
    assert np.all(np.asarray(d)[0, :, 2:, :] <= 0.0)


# ------------------------------------------------------------- augmentation
def test_flip_statistics_and_consistency():
    key = jax.random.PRNGKey(0)
    B, H, W = 512, 4, 6
    data = np.tile(np.arange(W, dtype=np.float32), (B, 1, H, 1))
    labels = np.tile(np.arange(W, dtype=np.int32), (B, H, 1))
    d, l = augment.flip_x_axis(key, jnp.asarray(data), jnp.asarray(labels))
    d, l = np.asarray(d), np.asarray(l)
    flipped = d[:, 0, 0, 0] == W - 1
    # data and labels flip together
    np.testing.assert_array_equal(d[:, 0, 0, :].astype(np.int32), l[:, 0, :])
    assert 0.40 < flipped.mean() < 0.60


def test_add_noise_statistics():
    key = jax.random.PRNGKey(1)
    B = 256
    data = np.ones((B, 1, 32, 32), dtype=np.float32)
    out = np.asarray(augment.add_noise(key, jnp.asarray(data)))
    changed_frac = (out != 1.0).reshape(B, -1).mean(axis=1)
    applied = changed_frac > 0.0
    assert 0.40 < applied.mean() < 0.60          # p=0.5 per sample
    frac = changed_frac[applied]
    assert 0.035 < frac.mean() < 0.065           # ~5% of pixels
    vals = out[out != 1.0]
    assert vals.min() >= 0.0 and vals.max() <= 10.0
    # roughly half increased, half decreased
    assert 0.4 < (vals > 1.0).mean() < 0.6


@pytest.mark.parametrize("boundary", ["none", "frame"])
def test_refine_label_boundary_threshold_mask(rng, boundary):
    """The host-precomputed threshold predicate (quantized-transfer eval)
    must reproduce the data-threshold path bit-for-bit, and must be honored
    even when the data argument carries garbage (uint8 transfers ship dB
    codes, not raw sv)."""
    cases = [_random_refine_case(rng, boundary=boundary) for _ in range(4)]
    data = jnp.asarray(np.stack([c[0] for c in cases]))
    labels = jnp.asarray(np.stack([c[1] for c in cases]))
    want = np.asarray(label_ops.refine_label_boundary(data, labels))

    d = np.asarray(data)[:, -1]  # threshold channel, layout (B, C, H, W)
    thr = jnp.asarray((d > 1e-7) & (d < 1e-4))
    got = np.asarray(label_ops.refine_label_boundary(
        jnp.zeros_like(data), labels, threshold_mask=thr))
    np.testing.assert_array_equal(got, want)
