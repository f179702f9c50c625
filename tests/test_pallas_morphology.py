"""Pallas closing kernel vs scipy/conv oracles (interpret mode on CPU)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from crimac_unet_tpu.ops import morphology
from crimac_unet_tpu.ops.pallas_morphology import binary_closing_pallas


def test_pallas_closing_matches_scipy(rng):
    masks = rng.rand(4, 40, 48) > 0.75
    clip = np.ones_like(masks)
    got = np.asarray(binary_closing_pallas(jnp.asarray(masks),
                                           jnp.asarray(clip),
                                           interpret=True))
    disc = morphology.DISC_7X7.astype(bool)
    for i in range(masks.shape[0]):
        want = ndi.binary_closing(masks[i], structure=disc)
        np.testing.assert_array_equal(got[i], want, err_msg=f"sample {i}")


def test_pallas_closing_with_clip_matches_conv(rng):
    masks = rng.rand(3, 32, 32) > 0.7
    clip = np.zeros_like(masks)
    clip[:, 4:28, 6:30] = True
    masks = masks & clip  # threshold mask is zero outside the crop anyway
    got = np.asarray(binary_closing_pallas(jnp.asarray(masks),
                                           jnp.asarray(clip),
                                           interpret=True))
    want = np.asarray(morphology.binary_closing(
        jnp.asarray(masks), clip_mask=jnp.asarray(clip)))
    np.testing.assert_array_equal(got, want)
