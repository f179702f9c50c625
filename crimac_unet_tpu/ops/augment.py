"""Data augmentation as batched device ops with explicit jax.random keys.

Distributionally identical to the reference's per-worker numpy augmentation
(crimac_unet/batch/data_augmentation/add_noise.py:19-34,
flip_x_axis.py:19-24); bit-streams differ because the RNGs differ (the
reference itself is not reproducible across worker scheduling, so this is
not a parity loss).

Layout: data (B, C, H, W) raw sv, labels (B, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_noise(key, data):
    """With p=0.5 per sample: multiply 5% of pixels by U[1,10] (half of them)
    or U[0,1] (the other half)."""
    B = data.shape[0]
    k_apply, k_change, k_incr, k_up, k_down = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k_apply, 0.5, (B,))          # per sample
    change = jax.random.bernoulli(k_change, 0.05, data.shape)  # per pixel
    increase = jax.random.bernoulli(k_incr, 0.5, data.shape)
    up = jax.random.uniform(k_up, data.shape, minval=1.0, maxval=10.0)
    down = jax.random.uniform(k_down, data.shape, minval=0.0, maxval=1.0)
    factor = jnp.where(change, jnp.where(increase, up, down), 1.0)
    factor = jnp.where(apply[:, None, None, None], factor, 1.0)
    return data * factor.astype(data.dtype)


def _flip_where(flip, arr):
    """Flip the trailing (ping) axis of ``arr`` where the per-sample
    ``flip`` mask is set (mask broadcast over the remaining axes)."""
    mask = flip.reshape(flip.shape + (1,) * (arr.ndim - 1))
    return jnp.where(mask, arr[..., ::-1], arr)


def flip_x_axis(key, data, labels):
    """With p=0.5 per sample: flip the ping (x) axis of data and labels."""
    flip = jax.random.bernoulli(key, 0.5, (data.shape[0],))
    return _flip_where(flip, data), _flip_where(flip, labels)


def augment_train(key, data, labels):
    """Train augmentation chain [add_noise, flip_x_axis]
    (reference transforms.py:39-45)."""
    k_noise, k_flip = jax.random.split(key)
    data = add_noise(k_noise, data)
    return flip_x_axis(k_flip, data, labels)


def augment_train_meta(key, data, meta, labels):
    """Metadata variant: noise on acoustic data only; the flip is applied
    consistently to data, meta and labels
    (reference add_noise.py:37-62, flip_x_axis.py:26-31)."""
    k_noise, k_flip = jax.random.split(key)
    data = add_noise(k_noise, data)
    flip = jax.random.bernoulli(k_flip, 0.5, (data.shape[0],))
    return (_flip_where(flip, data), _flip_where(flip, meta),
            _flip_where(flip, labels))
