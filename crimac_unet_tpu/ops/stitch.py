"""Device-side prediction stitching for sliding-window inference.

The reference scatters each patch's valid pixels into the output array with
per-patch Python fancy indexing on the host
(save_predict.py:41-65 ``fill_out_array``).  Because the grid interiors tile
the chunk exactly (stride = patch - 2*overlap, see ops/patches.py), the
whole scatter collapses into a reshape/transpose of the overlap-trimmed
patches plus elementwise masks — no scatter at all, fully fused by XLA.

Write-mask semantics (derived from the reference label-transform chain +
``fill_out_array`` exclusions {OVERLAP, SEABED, BOUNDARY}; refine/-30 and
unused/-10 pixels ARE written):
  keep = within chunk & within survey & finite(sv ch0) & finite(label)
         & not (raw label == 0 and row >= seabed + SEABED_PAD)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("R", "C", "overlap"))
def stitch_patches(probs: jnp.ndarray, R: int, C: int,
                   overlap: int) -> jnp.ndarray:
    """(N=R*C, wh, ww, K) row-major patches -> (R*sh, C*sw, K) image of the
    overlap-trimmed interiors."""
    N, wh, ww, K = probs.shape
    sh, sw = wh - 2 * overlap, ww - 2 * overlap
    interior = probs[:, overlap:wh - overlap, overlap:ww - overlap, :]
    img = interior.reshape(R, C, sh, sw, K)
    img = img.transpose(0, 2, 1, 3, 4)  # (R, sh, C, sw, K)
    return img.reshape(R * sh, C * sw, K)


# The chunk-level write masking lives with the inference engine
# (pipeline/inference.py GriddedRunner._mask_output).
