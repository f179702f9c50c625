"""Fine-grained breakdown of the predict host_slab phase (VERDICT r3 #3).

Times each component of pipeline/predict.py prepare() standalone on the
bench fixture's first 1000-ping chunk: native zarr decode into the HWC
slab, label slice read, the two np.packbits predicate packs, the
f32->bf16 slab cast, and the device_put set — so the host-wall work
lands on the right component before any fix is written.

  python scripts/host_slab_profile.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def t(fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    sys.path.insert(0, str(REPO))
    import bench
    sv = bench.ensure_fixture()
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.inference import _fill_hwc_slab

    reader = DataReaderZarr(sv)
    freqs = [18, 38, 120, 200]
    o, sh = 20, 216
    R = C = 5
    Hp = Wp = R * sh + 2 * o
    s, e = 0, 1000
    n_range = 1000

    slab = np.zeros((Hp, Wp, 4), np.float32)
    dt, _ = t(lambda: _fill_hwc_slab(reader, freqs, slab, max(0, s - o),
                                     min(4000, e + o), n_range, o, o))
    print(f"fill_hwc_slab (native decode): {dt*1e3:7.1f} ms")

    dt, lab = t(lambda: reader.get_label_slice(s, e - s, 0, n_range))
    print(f"label slice read:              {dt*1e3:7.1f} ms")
    label_pad = np.full((R * sh, C * sh), np.nan, np.float32)
    label_pad[:n_range, :e - s] = lab.T[:R * sh, :]

    dt, _ = t(lambda: np.packbits(np.isfinite(label_pad), axis=1))
    print(f"packbits(isfinite):            {dt*1e3:7.1f} ms")
    dt, _ = t(lambda: np.packbits(label_pad == 0, axis=1))
    print(f"packbits(==0):                 {dt*1e3:7.1f} ms")

    import ml_dtypes
    dt, xf = t(lambda: slab.astype(ml_dtypes.bfloat16))
    print(f"slab astype bf16 ({slab.nbytes/1e6:.0f} MB f32): "
          f"{dt*1e3:7.1f} ms")

    # candidate fast cast: f32 -> bf16 via uint32 round-to-nearest-even
    def fast_bf16(a):
        u = a.view(np.uint32)
        rounded = ((u >> 16) + ((u >> 15) & 1)).astype(np.uint16)
        return rounded.view(ml_dtypes.bfloat16)

    dt, xf2 = t(lambda: fast_bf16(slab))
    print(f"slab fast-cast bf16:           {dt*1e3:7.1f} ms")

    import jax
    dt, _ = t(lambda: jax.block_until_ready(jax.device_put(xf)))
    print(f"device_put bf16 slab:          {dt*1e3:7.1f} ms")
    # does jax accept + convert the f32 slab itself faster?
    dt, _ = t(lambda: jax.block_until_ready(
        jax.device_put(slab).astype(np.float32)))
    print(f"device_put f32 slab (2x bytes):{dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
