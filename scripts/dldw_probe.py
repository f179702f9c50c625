"""dL/dw reformulation probe (VERDICT r4 #2): XLA lowers the 3x3-conv
kernel-gradient as a convolution with the full spatial window, which
collapses at 256x256/C<=64 (up3.conv1 bwd 13.3 ms standalone vs a
0.78 ms bound — r4 bwd roofline, scripts/roofline_bwd.py).  This probe
times the pure-XLA alternative: dW as NINE tap einsums
``dw[ky,kx] = einsum('bhwc,bhwd->cd', x_pad[shifted], g)`` — each a
(C_in, C_out) matmul with a huge contraction dim the MXU streams —
against the default vjp, per named layer shape, correctness-checked
against the autodiff gradient first.

No Pallas, no custom calls: this is an XLA-level rewrite riding
custom_vjp, so the r5 pool campaign's layout-pinning failure mode
(docs/SESSIONS.md round 5) does not apply.

  python scripts/dldw_probe.py [--batch 8]
"""

import argparse
import functools
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import chain_time  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    # matches flax nn.Conv(dtype=bf16): all-bf16 conv, no explicit
    # preferred_element_type (MXU still accumulates f32 internally)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN)


def dw_default(x, w, g):
    """XLA's own kernel-gradient via vjp."""
    _, vjp = jax.vjp(lambda ww: conv(x, ww), w)
    return vjp(g)[0]


def dw_taps(x, g, kh=3, kw=3):
    """Kernel gradient as kh*kw shifted einsums, f32 accumulation."""
    xp = jnp.pad(x, ((0, 0), (kh // 2,) * 2, (kw // 2,) * 2, (0, 0)))
    H, W = x.shape[1], x.shape[2]
    rows = []
    for ky in range(kh):
        row = []
        for kx in range(kw):
            xs = jax.lax.slice(
                xp, (0, ky, kx, 0),
                (x.shape[0], ky + H, kx + W, x.shape[3]))
            row.append(jnp.einsum("bhwc,bhwd->cd", xs, g,
                                  preferred_element_type=jnp.float32))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)  # (kh, kw, Cin, Cout) f32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B = args.batch
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    print(f"device: {jax.devices()[0].device_kind}; batch {B}")
    rng = np.random.RandomState(0)

    # the r4 bwd-roofline offenders (name, H, W, Cin, Cout)
    shapes = [
        ("down0.conv1", 256, 256, 4, 64),
        ("down0.conv2", 256, 256, 64, 64),
        ("up3.conv1", 256, 256, 128, 64),
        ("up3.conv2", 256, 256, 64, 64),
        ("down1.conv2 (ctrl)", 128, 128, 128, 128),
    ]
    for name, H, W, Ci, Co in shapes:
        x = jnp.asarray(rng.randn(B, H, W, Ci) * .1, jnp.bfloat16)
        g = jnp.asarray(rng.randn(B, H, W, Co) * .1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Ci, Co) * .05, jnp.bfloat16)

        want = np.asarray(dw_default(x, w, g), np.float32)
        got = np.asarray(dw_taps(x, g), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        flops = 2 * B * H * W * 9 * Ci * Co
        t0 = chain_time(lambda s, xx, gg, w=w: dw_default(
            xx * (1.0 + s * 1e-12).astype(xx.dtype), w, gg), x, g,
            iters=16, reduce_out=True)
        t1 = chain_time(lambda s, xx, gg: dw_taps(
            xx * (1.0 + s * 1e-12).astype(xx.dtype), gg), x, g,
            iters=16, reduce_out=True)
        t0, t1 = max(t0, 1e-6), max(t1, 1e-6)
        print(f"  {name:<18} rel|d| {rel:.2e}  default {t0*1e3:7.2f} ms "
              f"({flops/t0/1e12:5.1f} TF)  taps {t1*1e3:7.2f} ms "
              f"({flops/t1/1e12:5.1f} TF)  speedup {t0/t1:4.1f}x")


if __name__ == "__main__":
    main()
