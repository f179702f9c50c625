"""A/B alternate XLA formulations of the level-0 U-Net ops on real TPU.

The per-layer roofline (scripts/roofline.py) shows the highest-resolution
level (256x256, C=64) running far under its roofline bound while every
deeper level sits AT the bound: down0.conv2 ~40 % of bound, down0.pool
~17 %, down0.conv1 ~43 %.  This script times semantically identical
reformulations of those ops to see whether a different lowering recovers
the slack (C=64 only half-fills the 128-lane dimension, so the default
lowering may waste lanes):

  pool:  reduce_window (prod)  vs  reshape+max  vs  4-strided-slice max
  conv:  NHWC lax.conv (prod)  vs  NCHW  vs  space-to-depth phase conv

Each variant is asserted equal to the production formulation before it
is timed.  Timing uses the roofline script's chained-loop harness.

  python scripts/l0_probe.py [--batch 32] [--ab-batch 8]
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import PEAK_HBM_BW, chain_time, gate  # noqa: E402


def pool_rw(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_reshape(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(y, axis=4), axis=2)


def pool_strided(x):
    return jnp.maximum(
        jnp.maximum(x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :]),
        jnp.maximum(x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :]))


def conv_nhwc(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def conv_nchw(x, w, b):
    # same math, NCHW activations / OIHW weights
    xt = jnp.transpose(x, (0, 3, 1, 2))
    wt = jnp.transpose(w, (3, 2, 0, 1))
    y = jax.lax.conv_general_dilated(
        xt, wt, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.nn.relu(y + b[None, :, None, None])
    return jnp.transpose(y, (0, 2, 3, 1))


def conv_s2d(x, w, b):
    """3x3 SAME conv computed on the space-to-depth image: pack 2x2
    pixel phases into channels (C 64 -> 256, filling the 128 lanes),
    run FOUR phase convs (each output phase needs a different tap
    alignment), and interleave back.  Mathematically identical."""
    B, H, W, C = x.shape
    Co = w.shape[-1]
    # pad once for SAME, then build the 2x2-phase stack of the PADDED
    # image so every phase conv can run VALID with 2x2 kernels over a
    # 3x3-tap footprint expressed in phase space.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phases of the padded image, each (B, H/2+1, W/2+1, C)
    ph = [[xp[:, py::2, px::2, :] for px in range(2)] for py in range(2)]
    # output phase (oy, ox) at s2d position (i, j) covers input rows
    # 2i+oy-1 .. 2i+oy+1 -> padded rows 2i+oy .. 2i+oy+2, i.e. phase
    # rows: for each tap dy in {0,1,2}: padded row r = 2i+oy+dy has
    # phase (r % 2) and index (r // 2).
    outs = []
    for oy in range(2):
        row = []
        for ox in range(2):
            acc = 0.0
            for dy in range(3):
                r = oy + dy            # offset within padded rows (base 2i)
                py, iy = r % 2, r // 2
                for dx in range(3):
                    s = ox + dx
                    px, ix = s % 2, s // 2
                    tap = ph[py][px][:, iy:iy + H // 2, ix:ix + W // 2, :]
                    acc = acc + jax.lax.dot_general(
                        tap, w[dy, dx],
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            row.append(acc.astype(x.dtype))
        outs.append(row)
    # interleave phases back: (B, H/2, W/2, Co) x4 -> (B, H, W, Co)
    top = jnp.stack([outs[0][0], outs[0][1]], axis=3)   # (B,H/2,W/2,2,Co)
    bot = jnp.stack([outs[1][0], outs[1][1]], axis=3)
    y = jnp.stack([top, bot], axis=2)                   # (B,H/2,2,W/2,2,Co)
    y = y.reshape(B, H, W, Co)
    return jax.nn.relu(y + b)


def conv_copad(x, w, b):
    """Same conv with output channels zero-padded 64 -> 128 (doubling
    the FLOPs) — if time stays ~equal, the N=64 lane underfill is real
    and the padded half was already being paid for."""
    co = w.shape[-1]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, co)))
    bp = jnp.pad(b, ((0, co),))
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + bp)[..., :co]


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel block (py*2+px)*C+c
    holds phase (py, px)."""
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(B, H // 2, W // 2, 4 * C)


def d2s(z, C):
    B, Hh, Wh, _ = z.shape
    y = z.reshape(B, Hh, Wh, 2, 2, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(B, 2 * Hh, 2 * Wh, C)


def s2d_kernel(w):
    """Rearrange a 3x3 (Ci, Co) kernel into the equivalent 2x2 s2d-space
    kernel (4Ci, 4Co): y_phase(oy,ox)[i,j] needs padded-input rows
    2i+oy+dy, i.e. s2d row offset (oy+dy)//2 with phase (oy+dy)%2."""
    Ci, Co = w.shape[2], w.shape[3]
    k2 = np.zeros((2, 2, 4 * Ci, 4 * Co), np.float32)
    wf = np.asarray(w, np.float32)
    for oy in range(2):
        for ox in range(2):
            for dy in range(3):
                q = oy + dy
                di, py = q // 2, q % 2
                for dx in range(3):
                    r = ox + dx
                    dj, px = r // 2, r % 2
                    k2[di, dj,
                       (py * 2 + px) * Ci:(py * 2 + px + 1) * Ci,
                       (oy * 2 + ox) * Co:(oy * 2 + ox + 1) * Co] += \
                        wf[dy, dx]
    return jnp.asarray(k2, w.dtype)


def conv_s2d2x2(x, k2, b):
    """3x3 SAME conv as ONE 2x2 VALID conv in s2d space: contraction
    2*2*4Ci, output lanes 4Co — both MXU-filling for Ci=Co=64, at the
    cost of 16/9 the FLOPs (the s2d kernel stores structural zeros).
    ``k2`` is the rearranged (2,2,4Ci,4Co) kernel from ``s2d_kernel``
    — a once-per-weight-load transform, kept out of the timed path."""
    B, H, W, C = x.shape
    Co = k2.shape[-1] // 4
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = s2d(xp[:, :, :, :])            # (B, (H+2)/2, (W+2)/2, 4C)
    yz = jax.lax.conv_general_dilated(
        z, k2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = d2s(yz, Co)
    return jax.nn.relu(y + b)


def convT_prod(x, w, b):
    y = jax.lax.conv_transpose(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def convT_s2d(x, w, b):
    """2x2-stride-2 transpose conv as ONE matmul: every output phase
    (oy, ox) is x @ w[1-oy, 1-ox] (lax.conv_transpose's mirrored-kernel
    law, same as models/unet.py Transpose2x2) — K=Ci, N=4*Co, then
    depth-to-space."""
    Ci, Co = w.shape[2], w.shape[3]
    # (Ci, 4Co) with phase-major output blocks, kernel taps mirrored
    wm = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).reshape(4 * Co, Ci).T
    z = jax.lax.dot_general(x, wm, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z.astype(x.dtype)
    # z channel block (oy*2+ox)*?: built as (oy,ox,Co) major -> matches d2s
    return d2s(z, Co) + b


def time_variant(name, fn, t_bound, *args, gate_idx=None, iters=None):
    # uniform full-sum consumption so XLA's DCE/slice-pushing cannot
    # prune any variant differently (strided pools and dot-built convs
    # ARE prunable under single-element consumption; reduce_window is
    # not — sum-consumption makes every arm comparable)
    if iters is None:
        iters = int(min(512, max(48, 0.12 / max(t_bound, 2e-5))))

    def gated(s, *a):
        a = list(a)
        gi = 1 if gate_idx is None else gate_idx
        if len(a) == 1:
            return fn(gate(s, a[0]))
        a[gi] = gate(s, a[gi])
        return fn(*a)

    t = chain_time(gated, *args, iters=iters, reduce_out=True)
    t = max(t, 1e-9)
    print(f"  {name:<28} {t*1e3:7.3f} ms   {t_bound/t:5.0%} of bound")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    from crimac_unet_tpu.utils.flops import device_peak_flops
    peak = device_peak_flops() or 197e12
    print(f"device: {jax.devices()[0].device_kind}")

    rng = np.random.RandomState(0)
    for B in [args.batch, args.train_batch]:
        if not B:
            continue
        H = W = args.size
        C = 64
        x = jnp.asarray(rng.randn(B, H, W, C) * .1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, C) * .05, jnp.bfloat16)
        b = jnp.asarray(rng.randn(C) * .05, jnp.bfloat16)

        k2 = s2d_kernel(w)

        # -- correctness first, on a 2-sample slice (same math at any
        # batch; full-batch f32 outputs are ~500 MB d2h over the tunnel)
        xs = x[:2]
        y0 = np.asarray(pool_rw(xs), np.float32)
        np.testing.assert_array_equal(y0, np.asarray(pool_reshape(xs),
                                                     np.float32))
        np.testing.assert_array_equal(y0, np.asarray(pool_strided(xs),
                                                     np.float32))
        c0 = np.asarray(conv_nhwc(xs, w, b), np.float32)
        for variant in (conv_nchw, conv_s2d, conv_copad):
            cv = np.asarray(variant(xs, w, b), np.float32)
            np.testing.assert_allclose(c0, cv, rtol=0.05, atol=0.05,
                                       err_msg=variant.__name__)
        np.testing.assert_allclose(
            c0, np.asarray(conv_s2d2x2(xs, k2, b), np.float32),
            rtol=0.05, atol=0.05, err_msg="conv_s2d2x2")
        # up3-style transpose conv: 128 -> 64 at half resolution
        xt = jnp.asarray(rng.randn(B, H // 2, W // 2, 2 * C) * .1,
                         jnp.bfloat16)
        wt = jnp.asarray(rng.randn(2, 2, 2 * C, C) * .05, jnp.bfloat16)
        bt = jnp.asarray(rng.randn(C) * .05, jnp.bfloat16)
        t0 = np.asarray(convT_prod(xt[:2], wt, bt), np.float32)
        t1 = np.asarray(convT_s2d(xt[:2], wt, bt), np.float32)
        np.testing.assert_allclose(t0, t1, rtol=0.05, atol=0.05)
        print(f"\n== pool 2x2/s2 at {B}x{H}x{W}x{C} bf16 ==")
        byts = (B * H * W * C + B * H * W * C // 4) * 2
        tb = byts / PEAK_HBM_BW
        print(f"  HBM bound {tb*1e3:.3f} ms")
        time_variant("reduce_window (prod)",
                     lambda xx: pool_rw(xx), tb, x)
        time_variant("reshape+max", lambda xx: pool_reshape(xx), tb, x)
        time_variant("4x strided slice max",
                     lambda xx: pool_strided(xx), tb, x)

        print(f"== conv3x3 {C}->{C} at {B}x{H}x{W} bf16 ==")
        fl = 2 * B * H * W * 9 * C * C
        byts = (2 * B * H * W * C + 9 * C * C) * 2
        tb = max(fl / peak, byts / PEAK_HBM_BW)
        print(f"  bound {tb*1e3:.3f} ms ({'MXU' if fl/peak > byts/PEAK_HBM_BW else 'HBM'})")
        time_variant("NHWC lax.conv (prod)", conv_nhwc, tb, x, w, b)
        time_variant("NCHW lax.conv", conv_nchw, tb, x, w, b)
        time_variant("Co zero-pad 64->128", conv_copad, tb, x, w, b)
        time_variant("s2d 2x2 conv (16/9 FLOPs)", conv_s2d2x2, tb,
                     x, k2, b)
        time_variant("s2d per-phase dots", conv_s2d, tb, x, w, b)

        print(f"== convT 2x2/s2 {2*C}->{C} at {B}x{H//2}x{W//2} bf16 ==")
        fl = 2 * B * (H // 2) * (W // 2) * 4 * (2 * C) * C
        byts = (B * (H // 2) * (W // 2) * 2 * C
                + B * H * W * C + 4 * 2 * C * C) * 2
        tb = max(fl / peak, byts / PEAK_HBM_BW)
        print(f"  bound {tb*1e3:.3f} ms "
              f"({'MXU' if fl/peak > byts/PEAK_HBM_BW else 'HBM'})")
        time_variant("conv_transpose (prod)", convT_prod, tb, xt, wt, bt)
        time_variant("s2d one-matmul", convT_s2d, tb, xt, wt, bt)


if __name__ == "__main__":
    main()
