"""Bit-parity and gating tests for the level-0 Pallas maxpool
(ops/pallas_pool.py) — the r5 kernel replacing XLA's reduce_window at
the C=64 level (reference maxpool: crimac_unet/models/unet.py:86).

On CPU the kernel runs in the Pallas interpreter (slow; tiny shapes
only) — the TPU-compiled path is bit-checked on hardware by
scripts/pallas_pool_v2.py and the forward A/B in BASELINE.md r5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crimac_unet_tpu.ops import pallas_pool as PP


@pytest.mark.parametrize("shape", [(2, 16, 2, 64), (2, 16, 32, 64),
                                   (4, 32, 6, 64), (8, 16, 34, 64)])
def test_bit_equal_vs_reduce_window(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randn(*shape) * 2.0, jnp.bfloat16)
    assert PP.supported(x.shape, x.dtype)
    got = np.asarray(PP.maxpool2x2(x, interpret=True), np.float32)
    want = np.asarray(PP.maxpool2x2_reference(x), np.float32)
    np.testing.assert_array_equal(got, want)


def test_nan_semantics_exact():
    """Pure elementwise maxes since the r5 rewrite: NaN propagation is
    bit-identical to reduce_window's (the earlier compactor-matmul
    design spread NaN across channels; the layout-native kernel has no
    matmul)."""
    rng = np.random.RandomState(7)
    a = rng.randn(2, 16, 8, 64).astype(np.float32)
    a[0, 3, 2, 5] = np.nan
    a[1, 0, 0, 0] = np.inf
    a[1, 1, 1, 1] = -np.inf
    x = jnp.asarray(a, jnp.bfloat16)
    got = np.asarray(PP.maxpool2x2(x, interpret=True), np.float32)
    want = np.asarray(PP.maxpool2x2_reference(x), np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m], want[m])


def test_supported_gates():
    bf16, f32 = jnp.bfloat16, jnp.float32
    assert PP.supported((32, 256, 256, 64), bf16)
    assert PP.supported((8, 256, 256, 64), bf16)   # train batch
    assert PP.supported((2, 128, 128, 64), bf16)
    assert not PP.supported((1, 1024, 1088, 64), bf16)  # B*C=64 half-lane
    assert not PP.supported((3, 32, 6, 64), bf16)       # B*C=192 not %128
    assert not PP.supported((32, 256, 256, 64), f32)    # f32 compute
    assert not PP.supported((32, 255, 256, 64), bf16)   # odd H
    assert not PP.supported((32, 256, 256), bf16)       # not 4-D
    # deeper levels (C>=128): supported() may be True geometrically but
    # the model only routes C==64 through the kernel (DownConv gate)


def test_resolve_flag():
    """'auto' resolves to False on every backend (the r5 full-forward
    A/B measured the kernel slower in context — layout-pin copy
    cascade); explicit True remains the A/B switch."""
    assert PP.resolve_flag(True, jnp.bfloat16) is True
    assert PP.resolve_flag(False, jnp.bfloat16) is False
    assert PP.resolve_flag("auto", jnp.bfloat16) is False
    assert PP.resolve_flag("auto", jnp.float32) is False


def test_model_integration_interpret():
    """UNet with pallas_pool=True (eval mode) matches pallas_pool=False
    bit-for-bit on CPU via the interpreter-backed kernel."""
    from crimac_unet_tpu.models.unet import UNet
    import crimac_unet_tpu.ops.pallas_pool as pp

    orig = pp.maxpool2x2
    import functools
    pp.maxpool2x2 = functools.partial(orig, interpret=True)
    try:
        kw = dict(depth=3, start_filts=64, dtype=jnp.bfloat16)
        m0 = UNet(pallas_pool=False, **kw)
        m1 = UNet(pallas_pool=True, **kw)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 4),
                        jnp.float32)
        v = m0.init(jax.random.PRNGKey(0), x, train=False)
        y0 = m0.apply(v, x, train=False)
        y1 = m1.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    finally:
        pp.maxpool2x2 = orig


def test_fused_relu_pool_skip_interpret():
    """relu_pool_skip (the fused A/B variant) returns exactly
    (maxpool2x2(relu(x)), relu(x))."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 8, 64), jnp.bfloat16)
    pool, skip = PP.relu_pool_skip(x, interpret=True)
    want_skip = jax.nn.relu(x)
    want_pool = PP.maxpool2x2_reference(want_skip)
    np.testing.assert_array_equal(np.asarray(skip, np.float32),
                                  np.asarray(want_skip, np.float32))
    np.testing.assert_array_equal(np.asarray(pool, np.float32),
                                  np.asarray(want_pool, np.float32))
