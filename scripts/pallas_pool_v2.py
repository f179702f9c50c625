"""r5 Pallas maxpool campaign driver — reproduces the measurements
behind the pallas_pool verdict (ops/pallas_pool.py docstring,
docs/SESSIONS.md round 5).

Stages:
  1. standalone: XLA reduce_window vs the layout-native kernel
     (in-kernel-gated chain timing — see the harness note below);
  2. in-context: the full folded-BN serving forward (32x256x256x4)
     with pallas_pool off / on / fused relu+skip+pool, plus logits
     comparison.

HARNESS NOTE (the r4 correction): timing an opaque pallas_call with the
roofline chain's *outside* ``gate()`` multiplication adds a full-size
un-fusable XLA copy per iteration (plus a read pass under
``reduce_out=True``), which capped every r4 Pallas measurement at
~90-150 GB/s and produced the false "naive Pallas blocking is 2x slower
per byte than XLA" negative.  With the gate INSIDE the kernel the same
machine streams 606-648 GB/s through Pallas copies.  XLA ops fuse the
gate and are unaffected.

  python scripts/pallas_pool_v2.py [--batch 32]
"""

import argparse
import dataclasses
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import PEAK_HBM_BW, chain_time  # noqa: E402
from crimac_unet_tpu.ops import pallas_pool as PP  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    B, H, W, C = args.batch, args.size, args.size, 64

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * .1, jnp.bfloat16)

    # -------- stage 1: standalone
    want = np.asarray(PP.maxpool2x2_reference(x[:2]), np.float32)
    got = np.asarray(PP.maxpool2x2(x[:2]), np.float32)
    np.testing.assert_array_equal(want, got)
    print("kernel: bit-equal vs reduce_window")
    byts = (B * H * W * C + B * H * W * C // 4) * 2
    tb = byts / PEAK_HBM_BW
    t = chain_time(lambda s, xx: PP.maxpool2x2_reference(
        xx * (1.0 + s * 1e-12).astype(xx.dtype)), x, iters=64,
        reduce_out=True)
    print(f"  reduce_window standalone: {t*1e3:7.3f} ms "
          f"({tb/t:5.0%} of {tb*1e3:.2f} ms bound)")
    t = chain_time(lambda s, xx: PP.maxpool2x2(
        xx * (1.0 + s * 1e-12).astype(xx.dtype)), x, iters=64,
        reduce_out=False)
    print(f"  layout-native kernel:     {t*1e3:7.3f} ms "
          "(outside-gate harness: add ~0.8 ms artifact)")

    # -------- stage 2: in-context serving forward
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.models.fold_bn import fold_for_serving
    from crimac_unet_tpu.utils import flops as F

    m = UNet(depth=5, start_filts=64, dtype=jnp.bfloat16,
             pallas_pool=False)
    x0 = jnp.zeros((1, H, W, 4), jnp.float32)
    v = jax.jit(lambda k: m.init(k, x0, train=False))(jax.random.PRNGKey(0))
    m_off, v_f = fold_for_serving(m, v, {})
    m_on = dataclasses.replace(m_off, pallas_pool=True)

    xin = jnp.asarray(rng.lognormal(-12, 3, (B, H, W, 4)).astype(np.float32))
    xin = jnp.clip(10 * jnp.log10(xin + 1e-10), -75, 0)
    fl = F.unet_forward_flops(H, W, in_channels=4, depth=5,
                              start_filts=64) * B
    outs = {}
    for tag, mm in (("pallas OFF", m_off), ("pallas ON", m_on)):
        f = jax.jit(lambda xx, mm=mm: mm.apply(v_f, xx, train=False))
        outs[tag] = np.asarray(f(xin))
        t = chain_time(lambda s, xx, f=f: f(
            xx * (1.0 + s * 1e-12).astype(xx.dtype)), xin, iters=32,
            reduce_out=False)
        print(f"  serving forward {tag}: {t*1e3:6.2f} ms  "
              f"MFU {fl/t/1e12/197:5.1%}")
    d = np.abs(outs["pallas OFF"] - outs["pallas ON"]).max()
    print(f"  logits max |d| ON vs OFF: {d} (conv-layout reflow numerics; "
          "bit-equal at op level)")


if __name__ == "__main__":
    main()
