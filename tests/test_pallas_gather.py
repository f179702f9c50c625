"""Pallas fused gather+dB kernel: parity with the XLA formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crimac_unet_tpu.ops import data_ops
from crimac_unet_tpu.ops.pallas_gather import gather_db_pallas


@pytest.mark.parametrize("scaled", [False, True])
def test_gather_db_parity(rng, scaled):
    cf, hp, wp = 4, 96, 128
    wh, ww = 32, 32
    slab = rng.lognormal(np.log(1e-6), 2.0, (cf, hp, wp)).astype(np.float32)
    slab[0, 5:9, 10:20] = np.nan
    slab[2, 50:52, :] = np.inf
    n = 13
    y0s = rng.randint(0, hp - wh + 1, n).astype(np.int32)
    x0s = rng.randint(0, wp - ww + 1, n).astype(np.int32)

    got = np.asarray(gather_db_pallas(
        jnp.asarray(slab), jnp.asarray(y0s), jnp.asarray(x0s), (wh, ww),
        scaled=scaled, interpret=jax.default_backend() != "tpu"))

    # XLA oracle: dynamic_slice gather + the fused elementwise chain
    def one(y0, x0):
        return jax.lax.dynamic_slice(slab, (0, y0, x0), (cf, wh, ww))
    patches = jax.vmap(one)(jnp.asarray(y0s), jnp.asarray(x0s))
    patches = jnp.where(jnp.isfinite(patches), patches, 0.0)
    d = (data_ops.db_with_limits_scaled(patches) if scaled
         else data_ops.db_with_limits(patches))
    want = np.asarray(d.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
