"""Data-plane transforms as batched, jittable device ops.

Fuses the reference's per-patch numpy transforms
(crimac_unet/batch/data_transforms/*) into single XLA programs: dB transform
with limits, non-finite scrub, and test-time border zeroing.  XLA fuses
these elementwise chains into the surrounding convolutions for free.

Layout: data (B, C, H, W) float32 (raw sv), labels (B, H, W) int32.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import LABEL_BOUNDARY_VAL, LABEL_IGNORE_VAL

DB_EPS = 1e-10
DB_LOW = -75.0
DB_HIGH = 0.0


def remove_nan_inf(data, labels, new_value=0.0):
    """Non-finite data -> ``new_value``; labels where *channel 0* is
    non-finite -> IGNORE (reference remove_nan_inf.py:22-33)."""
    ch0_bad = ~jnp.isfinite(data[:, 0])
    labels = jnp.where(ch0_bad, LABEL_IGNORE_VAL, labels)
    data = jnp.where(jnp.isfinite(data), data, new_value)
    return data, labels


def db(data, eps=DB_EPS):
    """Decibel transform 10*log10(x + eps)
    (reference db_with_limits.py:37-39)."""
    return 10.0 * jnp.log10(data + eps)


def db_with_limits(data, limit_low=DB_LOW, limit_high=DB_HIGH):
    """dB transform clipped to [low, high]
    (reference db_with_limits.py:20-24)."""
    return jnp.clip(db(data), limit_low, limit_high)


def db_with_limits_scaled(data, limit_low=DB_LOW, limit_high=DB_HIGH):
    """dB transform scaled to [0, 1] — used for metadata-channel runs
    (reference db_with_limits.py:28-35)."""
    d = jnp.minimum(db(data), 0.0)
    d = jnp.clip(d, limit_low, limit_high)
    return 1.0 + d / abs(limit_low)


def set_data_border_value(data, labels, border_value=0.0,
                          channels_last=False):
    """Zero data (in dB space — applied after db_with_limits) where labels
    mark the data boundary; test-time only
    (reference set_data_border_value.py:19-23, transforms.py:57-64).
    ``channels_last`` broadcasts over NHWC patch batches."""
    border = (labels == LABEL_BOUNDARY_VAL)
    border = border[:, :, :, None] if channels_last \
        else border[:, None, :, :]
    return jnp.where(border, border_value, data)


def data_transform_train(data, labels, scaled=False):
    """Train-time data chain [remove_nan_inf, db_with_limits]
    (reference transforms.py:48-54)."""
    data, labels = remove_nan_inf(data, labels)
    data = db_with_limits_scaled(data) if scaled else db_with_limits(data)
    return data, labels


def data_transform_test(data, labels, scaled=False):
    """Test-time data chain adds border zeroing
    (reference transforms.py:57-64)."""
    data, labels = data_transform_train(data, labels, scaled)
    data = set_data_border_value(data, labels)
    return data, labels
