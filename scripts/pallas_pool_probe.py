"""Pallas maxpool-2x2 probe: can a hand kernel close the level-0 pool's
roofline gap that XLA leaves open?

The r3/r4 rooflines measured XLA's reduce_window maxpool on the level-0
activation (B, 256, 256, 64) bf16 at ~16 % of its HBM bound (2.52 ms vs
0.41 ms at batch 32) — the worst-efficiency op of the whole forward.
Hypothesis: the NHWC layout puts C=64 in the lane dimension (half of the
128 lanes) and the window reduction strides the sublane dimension, so
the XLA lowering moves far more than the minimum bytes.  Variants:

  v1  blocked NHWC kernel: block (1, TH, W, C), reshape+max in VMEM
  v2  lane-packed: input viewed (B, H, W*C) with a (.., 2, C) lane
      reshape — REJECTED by Mosaic (arbitrary lane-dim reshapes)
  v3  lane128: (rows, W*C) viewed (rows, W/2, 128) so each trailing
      group is exactly one lane tile; W-max is a half-tile slice max,
      H-max splits the leading dim (both Mosaic-natural)

Each variant is asserted bit-equal to reduce_window, then timed with the
roofline chain harness (on-device fori_loop, scalar carry).

Status — RESOLVED in r5 (docs/SESSIONS.md round 5; superseded by
scripts/pallas_pool_v2.py and ops/pallas_pool.py): (a) the "v1 ~2x
slower per byte" r4 numbers were a HARNESS ARTIFACT — the outside
gate() multiply cannot fuse into an opaque pallas_call and added a
full-size XLA copy per timing iteration; with in-kernel gating the
chip streams 606-648 GB/s through Pallas.  (b) The HTTP 500s are
deterministic Mosaic crashes, not weather: pltpu.roll crashes on any
shape (so v2/v3 as written can never compile), and W=256-footprint
4-D blocks crash past ~40 grid programs.  (c) The final layout-native
kernel is bit-equal and fast standalone but LOSES in the full fused
forward (layout-pin copy cascade) — see ops/pallas_pool.py for the
shipped verdict.  This probe is kept as the historical r4 record.

  python scripts/pallas_pool_probe.py [--batch 32]
"""

import argparse
import functools
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roofline import PEAK_HBM_BW, chain_time, gate  # noqa: E402


def pool_rw(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


# ------------------------------------------------------------ variant 1
def _pool_kernel_nhwc(x_ref, o_ref):
    x = x_ref[0]                       # (TH, W, C)
    th, w, c = x.shape
    y = x.reshape(th // 2, 2, w // 2, 2, c)
    o_ref[0] = jnp.max(jnp.max(y, axis=3), axis=1)


def pool_pallas_nhwc(x, tile_h=32):
    B, H, W, C = x.shape
    grid = (B, H // tile_h)
    return pl.pallas_call(
        _pool_kernel_nhwc,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_h, W, C),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h // 2, W // 2, C),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


# ------------------------------------------------------------ variant 3
def _pool_kernel_lane128(x_ref, o_ref):
    """Mosaic-natural formulation: the flattened (row, W*C) input is
    viewed as (rows, W/2, 2C) — with C=64 each trailing group is EXACTLY
    one 128-lane tile, so the W-pair max is a half-tile slice max (no
    lane reshuffle) and the H-pair max splits the LEADING dim (free)."""
    x = x_ref[0]                       # (TH, W*C)
    th, wc = x.shape
    y = x.reshape(th, wc // 128, 128)  # trailing dim == one lane tile
    wmax = jnp.maximum(y[:, :, :64], y[:, :, 64:])   # (TH, W/2, 64)
    z = wmax.reshape(th // 2, 2, (wc // 128) * 64)
    o_ref[0] = jnp.max(z, axis=1)      # (TH/2, W/2*C)


def pool_pallas_lane128(x, tile_h=32):
    B, H, W, C = x.shape
    assert C == 64
    xf = x.reshape(B, H, W * C)
    out = pl.pallas_call(
        _pool_kernel_lane128,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, (W // 2) * C), x.dtype),
        grid=(B, H // tile_h),
        in_specs=[pl.BlockSpec((1, tile_h, W * C),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h // 2, (W // 2) * C),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out.reshape(B, H // 2, W // 2, C)


# ------------------------------------------------------------ variant 2
def _pool_kernel_packed(x_ref, o_ref, *, c):
    x = x_ref[0]                       # (TH, W*C) lanes
    th, wc = x.shape
    # W-pairs: adjacent c-lane groups; split even/odd w
    y = x.reshape(th, wc // (2 * c), 2, c)
    y = jnp.max(y, axis=2)             # (TH, W/2, C)
    y = y.reshape(th // 2, 2, (wc // (2 * c)) * c)
    o_ref[0] = jnp.max(y, axis=1)      # (TH/2, W/2*C)


def pool_pallas_packed(x, tile_h=32):
    B, H, W, C = x.shape
    xf = x.reshape(B, H, W * C)
    kern = functools.partial(_pool_kernel_packed, c=C)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, (W // 2) * C), x.dtype),
        grid=(B, H // tile_h),
        in_specs=[pl.BlockSpec((1, tile_h, W * C),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h // 2, (W // 2) * C),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out.reshape(B, H // 2, W // 2, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chan", type=int, default=64)
    args = ap.parse_args()
    B, H, W, C = args.batch, args.size, args.size, args.chan

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    print(f"device: {jax.devices()[0].device_kind}; pool 2x2/s2 on "
          f"{B}x{H}x{W}x{C} bf16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * .1, jnp.bfloat16)

    want = np.asarray(pool_rw(x[:2]), np.float32)
    for name, fn in (("pallas nhwc", pool_pallas_nhwc),
                     ("pallas lane128", pool_pallas_lane128),
                     ("pallas packed", pool_pallas_packed)):
        try:
            got = np.asarray(fn(x[:2]), np.float32)
            np.testing.assert_array_equal(want, got)
            print(f"  {name}: bit-equal")
        except Exception as exc:
            print(f"  {name}: FAILED {type(exc).__name__}: {exc}"[:400])

    byts = (B * H * W * C + B * H * W * C // 4) * 2
    tb = byts / PEAK_HBM_BW
    print(f"  HBM bound {tb*1e3:.3f} ms")
    for name, fn in (("reduce_window (prod)", pool_rw),
                     ("pallas nhwc", pool_pallas_nhwc),
                     ("pallas lane128", pool_pallas_lane128),
                     ("pallas packed", pool_pallas_packed)):
        try:
            t = chain_time(lambda s, xx, f=fn: f(gate(s, xx)), x,
                           iters=128, reduce_out=True)
            print(f"  {name:<24} {t*1e3:7.3f} ms  {tb/max(t,1e-9):5.0%} "
                  f"of bound")
        except Exception as exc:
            print(f"  {name:<24} failed: {exc}"[:300])


if __name__ == "__main__":
    main()
