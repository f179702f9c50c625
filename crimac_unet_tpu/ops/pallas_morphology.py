"""Pallas TPU kernel: fused binary closing with the 7x7 disc.

The label-refinement morphology (ops/morphology.py) lowers to two separate
convolutions through XLA, each round-tripping the mask through HBM.  This
kernel fuses dilation + clip + erosion in one VMEM-resident pass per patch:
the mask tile is padded into a VMEM scratch buffer and both neighbourhood
counts are accumulated as 37 static-slice VPU adds each (the set offsets of
the disc), so HBM traffic is one read + one write of the mask.

Falls back to the conv implementation off-TPU; bit-parity with scipy is
enforced in tests (interpret mode on CPU + the conv oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .morphology import DISC_7X7

_OFFSETS = tuple((int(dy), int(dx))
                 for dy, dx in np.argwhere(DISC_7X7 > 0))
_K = DISC_7X7.shape[0]          # 7
_PAD = _K // 2                  # 3
_N_SET = len(_OFFSETS)          # 37


def _closing_kernel(mask_ref, clip_ref, out_ref, scratch, dil_scratch):
    """One (1, H, W) mask block per grid step; everything stays in VMEM."""
    H, W = out_ref.shape[1], out_ref.shape[2]

    # zero-padded mask in scratch (zero border == scipy border_value=0)
    scratch[:, :] = jnp.zeros_like(scratch)
    scratch[_PAD:_PAD + H, _PAD:_PAD + W] = mask_ref[0, :, :]

    # dilation: any set neighbour under the disc
    count = jnp.zeros((H, W), jnp.float32)
    for dy, dx in _OFFSETS:
        count = count + scratch[dy:dy + H, dx:dx + W]
    dil = (count > 0.5).astype(jnp.float32)
    # confine to the crop bbox (scipy closing applied to a cropped array)
    dil = dil * clip_ref[0, :, :]

    dil_scratch[:, :] = jnp.zeros_like(dil_scratch)
    dil_scratch[_PAD:_PAD + H, _PAD:_PAD + W] = dil

    # erosion: all disc neighbours set
    count = jnp.zeros((H, W), jnp.float32)
    for dy, dx in _OFFSETS:
        count = count + dil_scratch[dy:dy + H, dx:dx + W]
    out_ref[0, :, :] = (count > _N_SET - 0.5).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def binary_closing_pallas(mask: jnp.ndarray, clip_mask: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) bool/int mask + clip mask -> closed (B, H, W) bool.

    Equivalent to ``morphology.binary_closing(mask, clip_mask=clip_mask)``.
    """
    B, H, W = mask.shape
    m = mask.astype(jnp.float32)
    c = clip_mask.astype(jnp.float32)

    out = pl.pallas_call(
        _closing_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * _PAD, W + 2 * _PAD), jnp.float32),
            pltpu.VMEM((H + 2 * _PAD, W + 2 * _PAD), jnp.float32),
        ],
        interpret=interpret,
    )(m, c)
    return out > 0.5
