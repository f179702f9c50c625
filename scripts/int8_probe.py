"""Probe: does XLA hit the v5e int8 MXU path for our conv shapes?

Times bf16 vs int8(->int32) lax.conv at the U-Net's dominant layer
shapes.  If int8 lands well above 1.3x, a quantized serving path is
worth building; if not, the idea dies here cheaply.

  python scripts/int8_probe.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def sync(o):
    # block_until_ready is not a reliable fence through the axon tunnel;
    # a tiny d2h of a reduction is (device stream is ordered)
    return float(np.asarray(jnp.sum(o.astype(jnp.float32)[::64, ::64])))


def burst(fn, *a, reps=20):
    from crimac_unet_tpu.utils.timing import burst_time
    return burst_time(fn, *a, reps=2, burst=reps, sync=sync)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    rng = np.random.RandomState(0)
    # (B, H, W, Cin, Cout): the layers carrying most of the U-Net FLOPs
    shapes = [
        (32, 256, 256, 64, 64),    # down0 unit2 (the big one)
        (32, 128, 128, 128, 128),  # down1
        (32, 64, 64, 256, 256),    # down2
        (32, 32, 32, 512, 512),    # down3
    ]
    for B, H, W, Ci, Co in shapes:
        # float32 from the start: float64 here transiently costs ~3 GB
        # of host temporaries per shape for a throughput probe
        x = rng.randn(B, H, W, Ci).astype(np.float32)
        w = rng.randn(3, 3, Ci, Co).astype(np.float32)
        xb = jax.device_put(jnp.asarray(x, jnp.bfloat16))
        wb = jax.device_put(jnp.asarray(w, jnp.bfloat16))
        xi = jax.device_put(jnp.asarray(
            np.clip(x * 16, -127, 127).astype(np.int8)))
        wi = jax.device_put(jnp.asarray(
            np.clip(w * 16, -127, 127).astype(np.int8)))
        f_bf = jax.jit(lambda a, b: conv(a, b, jnp.float32))
        f_i8 = jax.jit(lambda a, b: conv(a, b, jnp.int32))
        t_bf = burst(f_bf, xb, wb)
        t_i8 = burst(f_i8, xi, wi)
        flops = 2 * B * H * W * Ci * Co * 9
        print(f"B{B} {H}x{W} {Ci}->{Co}: bf16 {t_bf*1e3:7.2f} ms "
              f"({flops/t_bf/1e12:6.1f} TF/s)   int8 {t_i8*1e3:7.2f} ms "
              f"({flops/t_i8/1e12:6.1f} TOP/s)   speedup "
              f"{t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
