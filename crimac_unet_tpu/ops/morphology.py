"""Binary morphology as XLA convolutions.

The reference uses ``scipy.ndimage.binary_closing`` with a 7x7 disc inside
the label-refinement transform (refine_label_boundary.py:50-62,:96).  On TPU
that becomes two small convolutions on the VPU/MXU: dilation = conv > 0,
erosion = conv == sum(structure), both with zero padding — which is exactly
scipy's ``border_value=0`` semantics for both operators.

All functions are batched over a leading batch axis and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 7x7 disc structuring element (refine_label_boundary.py:50-58)
DISC_7X7 = np.array([
    [0, 0, 1, 1, 1, 0, 0],
    [0, 1, 1, 1, 1, 1, 0],
    [1, 1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1, 1],
    [0, 1, 1, 1, 1, 1, 0],
    [0, 0, 1, 1, 1, 0, 0],
], dtype=np.float32)


def _structure_conv(mask: jnp.ndarray, structure: np.ndarray) -> jnp.ndarray:
    """Counts of set neighbours under the structuring element, zero-padded.

    mask: (B, H, W) float32 in {0, 1}.  Returns (B, H, W) float32 counts.
    """
    kh, kw = structure.shape
    kernel = jnp.asarray(structure, jnp.float32)[None, None]  # OIHW
    out = jax.lax.conv_general_dilated(
        mask[:, None].astype(jnp.float32),  # NCHW
        kernel,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def binary_dilation(mask: jnp.ndarray, structure=DISC_7X7) -> jnp.ndarray:
    """scipy.ndimage.binary_dilation with border_value=0 (batched)."""
    return _structure_conv(mask.astype(jnp.float32), structure) > 0.5


def binary_erosion(mask: jnp.ndarray, structure=DISC_7X7) -> jnp.ndarray:
    """scipy.ndimage.binary_erosion with border_value=0 (batched)."""
    total = float(np.sum(structure))
    return _structure_conv(mask.astype(jnp.float32), structure) > total - 0.5


def binary_closing(mask: jnp.ndarray, structure=DISC_7X7,
                   clip_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dilation then erosion.  ``clip_mask`` (if given) zeroes the dilated
    mask outside a region before eroding — reproducing scipy closing applied
    to a *cropped* array (the reference closes within the non-boundary bbox
    of each patch, refine_label_boundary.py:85-96, so beyond-crop pixels act
    as zeros for the erosion)."""
    dil = binary_dilation(mask, structure)
    if clip_mask is not None:
        dil = jnp.logical_and(dil, clip_mask)
    return binary_erosion(dil, structure)
