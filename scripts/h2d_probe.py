"""Characterize h2d transfer cost through the axon tunnel: per-put
latency vs bandwidth, small-array batching, and the cost profile of one
predict chunk's actual transfer set (pipeline/predict.py prepare()).

Decides VERDICT r3 weak #3 between two candidate fixes for the e2e
host/transfer wall: (a) batch the ~10 small per-chunk device_puts into
one buffer (wins if latency-bound), (b) trim slab pad bytes by shipping
the unpadded slab and padding on device (wins if bandwidth-bound).

  python scripts/h2d_probe.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def t_put(arrs, reps=5):
    """Best wall time to device_put all arrays in `arrs` and be done."""
    best = None
    for _ in range(reps):
        t0 = time.time()
        devs = [jax.device_put(a) for a in arrs]
        jax.block_until_ready(devs)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    rng = np.random.RandomState(0)

    # 1. latency floor: one tiny put
    tiny = np.zeros(8, np.float32)
    print(f"1-elem put: {t_put([tiny])*1e3:7.2f} ms")

    # 2. bandwidth curve
    for mb in (1, 4, 10, 20, 40):
        a = rng.randn(mb * 1024 * 1024 // 4).astype(np.float32)
        t = t_put([a])
        print(f"{mb:3d} MB put: {t*1e3:7.1f} ms  -> {mb/t:6.1f} MB/s")

    # 3. N small puts vs one batched put (the per-chunk small-array set)
    smalls = [rng.randn(20000).astype(np.float32) for _ in range(10)]
    t_sep = t_put(smalls)
    t_cat = t_put([np.concatenate(smalls)])
    print(f"10 x 80KB separate: {t_sep*1e3:7.1f} ms; "
          f"one 800KB put: {t_cat*1e3:7.1f} ms")

    # 4. a real chunk's transfer set (bench geometry, bf16 slab)
    import ml_dtypes
    Hp = Wp = 5 * 216 + 40
    slab = rng.randn(Hp, Wp, 4).astype(np.float32).astype(ml_dtypes.bfloat16)
    packed = np.zeros((1080, 135), np.uint8)
    small = [packed, packed.copy(), np.zeros(1080, np.int64),
             np.zeros((), np.int32), np.zeros(25, np.int32),
             np.zeros(25, np.int32), np.zeros((0, 1, 1), np.float32),
             np.zeros((25, 0), np.float32), np.zeros((1, 1, 0), np.float32),
             np.zeros((1, 1), np.float32)]
    t_full = t_put([slab] + small)
    t_slab = t_put([slab])
    t_small = t_put(small)
    mb = slab.nbytes / 1e6
    print(f"chunk set: slab {mb:.1f} MB {t_slab*1e3:7.1f} ms "
          f"({mb/t_slab:6.1f} MB/s); 10 small arrays {t_small*1e3:7.1f} ms; "
          f"all together {t_full*1e3:7.1f} ms")

    # 5. cropped slab (no pad rows/cols) vs padded
    slab_c = np.ascontiguousarray(slab[:1020, :1040])
    t_crop = t_put([slab_c])
    print(f"cropped slab {slab_c.nbytes/1e6:.1f} MB: {t_crop*1e3:7.1f} ms "
          f"(vs padded {t_slab*1e3:.1f} ms)")

    # 6. does a put overlap device compute? dispatch a long matmul chain,
    # then put the slab while it runs
    w = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda w: jax.lax.fori_loop(
        0, 100, lambda i, a: a @ w / 64.0, w))
    f(w).block_until_ready()  # compile
    t0 = time.time()
    out = f(w)
    t_disp = time.time() - t0
    t0 = time.time()
    d = jax.device_put(slab)
    jax.block_until_ready(d)
    t_put_during = time.time() - t0
    out.block_until_ready()
    t_total = time.time() - t0
    print(f"put during compute: dispatch {t_disp*1e3:.1f} ms, put "
          f"{t_put_during*1e3:.1f} ms, total-with-compute "
          f"{t_total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
