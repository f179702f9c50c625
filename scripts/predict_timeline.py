"""Absolute-timestamp timeline of one warm predict pass (VERDICT r3 #3).

Monkeypatches jax.device_put, the runner's jit programs, and
block_until_ready to log (event, t0, t1, MB) tuples during one warm
save_survey_predictions_zarr pass over the bench fixture, then prints
the merged timeline — so the e2e wall decomposes into WHO blocks WHOM
(prepare threads, tunnel transfers, device compute, drain, writer)
instead of per-thread phase totals that overlap.

  python scripts/predict_timeline.py
"""

import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

EVENTS = []
T0 = [0.0]


def log(name, t0, t1, mb=0.0):
    EVENTS.append((t0 - T0[0], t1 - T0[0], name, mb))


def main():
    sys.path.insert(0, str(REPO))
    import bench
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    sv = bench.ensure_fixture()
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (
        GriddedRunner, save_survey_predictions_zarr)
    import jax.numpy as jnp

    config = {"patch_size": [bench.PATCH, bench.PATCH],
              "patch_overlap": bench.OVERLAP, "frequencies": bench.FREQS,
              "fwd_batch": 32, "compute_dtype": "bfloat16",
              "depth": 5, "start_filts": 64}
    reader = DataReaderZarr(sv)
    model = build_unet(config)
    x = jnp.zeros((1, bench.PATCH, bench.PATCH, 4), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    runner = GriddedRunner(model, variables, config)
    out_dir = REPO / ".bench_cache" / "pred_tl.zarr"

    # warm pass (compile)
    save_survey_predictions_zarr(runner, reader, str(out_dir),
                                 preload_n_pings=bench.PRELOAD)

    # instrument
    real_put = jax.device_put
    real_block = jax.block_until_ready
    real_pp = runner._predict_patches
    real_mask = runner._mask_output

    def put(x, *a, **k):
        t0 = time.perf_counter()
        out = real_put(x, *a, **k)
        t1 = time.perf_counter()
        nb = getattr(x, "nbytes", 0) / 1e6
        log(f"put[{threading.current_thread().name[-1]}]", t0, t1, nb)
        return out

    def pp(*a, **k):
        t0 = time.perf_counter()
        out = real_pp(*a, **k)
        log("dispatch_predict", t0, time.perf_counter())
        return out

    def mask(*a, **k):
        t0 = time.perf_counter()
        out = real_mask(*a, **k)
        log("dispatch_mask", t0, time.perf_counter())
        return out

    def block(x):
        t0 = time.perf_counter()
        out = real_block(x)
        log("block_until_ready", t0, time.perf_counter())
        return out

    import crimac_unet_tpu.pipeline.predict as P
    jax.device_put = put
    P.jax.device_put = put
    old_block = P.jax.block_until_ready
    P.jax.block_until_ready = block
    runner._predict_patches = pp
    runner._mask_output = mask

    try:
        T0[0] = time.perf_counter()
        t0 = time.perf_counter()
        save_survey_predictions_zarr(runner, reader, str(out_dir),
                                     preload_n_pings=bench.PRELOAD)
        wall = time.perf_counter() - t0
    finally:
        jax.device_put = real_put
        P.jax.device_put = real_put
        P.jax.block_until_ready = old_block
        runner._predict_patches = real_pp
        runner._mask_output = real_mask

    print(f"wall: {wall:.3f} s -> {bench.N_PINGS/wall:.0f} pings/s")
    print(f"{'t0':>8} {'t1':>8} {'dur_ms':>8}  event (MB)")
    for t0_, t1_, name, mb in sorted(EVENTS):
        print(f"{t0_*1e3:8.1f} {t1_*1e3:8.1f} {(t1_-t0_)*1e3:8.1f}  "
              f"{name}" + (f" ({mb:.1f} MB)" if mb else ""))


if __name__ == "__main__":
    main()
