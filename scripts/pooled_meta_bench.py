"""Pooled vs host-crop METADATA training on the real chip.

Quantifies the pooled-meta path added in r3: flagship shapes (256x256,
depth-5/64, bf16, batch 8), all six metadata channel families (10 input
channels).  Three arms, each a serial feed+step loop like the r2 pooled
measurement (BASELINE.md "HBM sample pool 40.6 ms/step vs host-crop path
207.9 ms/step"):

  host   — crop_data + crop_labels + crop_meta on the host per batch,
           h2d of ~13 MB crops+meta, train step
  pooled — host draws (echogram, center) coords only; crops AND meta
           maps gather/compute on device inside the fused step
  staged — pre-staged device arrays (pure compute bound, for context)

Usage:  python scripts/pooled_meta_bench.py  (writes JSON to stdout)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PATCH = 256
FREQS = [18, 38, 120, 200]
ALL_META = {"portion_year": True, "portion_day": True, "depth_rel": True,
            "depth_abs_surface": True, "depth_abs_seabed": True,
            "time_diff": True}
BATCH = 8
STEPS = 10
WARMUP = 3


def main():
    import tempfile

    import jax

    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.meta_channels import crop_meta
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline import engine

    config = {"patch_size": [PATCH, PATCH], "frequencies": FREQS,
              "lr": 0.005, "lr_step": 1000, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 5, "start_filts": 64,
              "compute_dtype": "bfloat16", "batch_size": BATCH,
              "meta_channels": ALL_META}
    model = build_unet(config)

    with tempfile.TemporaryDirectory() as td:
        make_survey_dir(td, year=2017, n_echograms=2, H=600, W=1500,
                        seed=11)
        readers = get_echograms(years=[2017], path_to_echograms=td,
                                minimum_shape=PATCH)
        pool = DeviceSamplePool(readers, FREQS, [PATCH, PATCH],
                                meta_channels=ALL_META)
        rng = np.random.RandomState(3)

        def draw():
            return [(readers[rng.randint(len(readers))],
                     [rng.randint(0, 600), rng.randint(0, 1500)])
                    for _ in range(BATCH)]

        host_step = engine.make_train_step(model, config)
        pool_step = engine.make_train_step_pooled(model, config)
        out = {}

        # ---- host-crop arm (crop + meta production + h2d per step)
        def host_batch():
            s = draw()
            data = np.stack([r.crop_data(list(c), [PATCH, PATCH], FREQS)
                             for r, c in s])
            labels = np.stack([r.crop_labels(list(c), [PATCH, PATCH])
                               for r, c in s]).astype(np.int32)
            meta = np.stack([crop_meta(r, list(c), [PATCH, PATCH],
                                       ALL_META) for r, c in s])
            return (jax.device_put(data), jax.device_put(labels),
                    jax.device_put(meta))

        state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        for _ in range(WARMUP):
            state, loss = host_step(state, *host_batch(), key)
        np.asarray(loss)
        t0 = time.time()
        for _ in range(STEPS):
            state, loss = host_step(state, *host_batch(), key)
        np.asarray(loss)
        out["host_ms"] = round((time.time() - t0) / STEPS * 1e3, 1)

        # ---- pooled arm (coords only; crops + meta computed on device)
        state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
        import jax.numpy as jnp

        def pool_batch():
            idxs, starts = pool.prepare_batch(draw())
            return jnp.asarray(idxs), jnp.asarray(starts)

        for _ in range(WARMUP):
            i_, s_ = pool_batch()
            state, loss = pool_step(state, pool.data, pool.labels,
                                    pool.meta_vectors, i_, s_, key,
                                    flags=pool.meta_flags)
        np.asarray(loss)
        t0 = time.time()
        for _ in range(STEPS):
            i_, s_ = pool_batch()
            state, loss = pool_step(state, pool.data, pool.labels,
                                    pool.meta_vectors, i_, s_, key,
                                    flags=pool.meta_flags)
        np.asarray(loss)
        out["pooled_ms"] = round((time.time() - t0) / STEPS * 1e3, 1)

        # ---- staged arm (pure compute, data resident)
        state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
        d0, l0, m0 = host_batch()
        for _ in range(WARMUP):
            state, loss = host_step(state, d0, l0, m0, key)
        np.asarray(loss)
        t0 = time.time()
        for _ in range(STEPS):
            state, loss = host_step(state, d0, l0, m0, key)
        np.asarray(loss)
        out["staged_ms"] = round((time.time() - t0) / STEPS * 1e3, 1)

        out["speedup_pooled_vs_host"] = round(
            out["host_ms"] / out["pooled_ms"], 2)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
