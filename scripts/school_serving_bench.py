"""Live school detection throughput at the serving preset (real chip).

Live mode = full predict (slab + uint8 transfer, the config_serving.yaml
preset) + streamed per-category connected components.  Companion number
to BASELINE.md's live 2027 pings/s (patch + bf16, eighth session)."""
import sys
import time
import warnings
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

cache = REPO / ".bench_cache" / "xla"
cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import build_unet
from crimac_unet_tpu.pipeline.school_eval import detect_reader_schools
from crimac_unet_tpu.pipeline.inference import GriddedRunner

sv_path = bench.ensure_fixture()
reader = DataReaderZarr(str(sv_path))
cfg = {"patch_size": [256, 256], "patch_overlap": 20,
       "frequencies": [18, 38, 120, 200], "fwd_batch": 32,
       "compute_dtype": "bfloat16", "depth": 5, "start_filts": 64}
model = build_unet(cfg)
import jax.numpy as jnp
x = jnp.zeros((1, 256, 256, 4), jnp.float32)
variables = jax.jit(lambda k: model.init(k, x, train=False))(
    jax.random.PRNGKey(0))

for tag, extra in (("patch+bf16", {}),
                   ("serving (slab+u8+static)",
                    dict(infer_mode="slab", transfer_dtype="uint8",
                         static_grid=True))):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = GriddedRunner(model, variables, dict(cfg, **extra))
    dets = detect_reader_schools(runner, reader, 1000)  # warm/compile
    best = None
    for _ in range(2):
        t0 = time.time()
        dets = detect_reader_schools(runner, reader, 1000)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n = sum(len(v) for v in dets.values()) if isinstance(dets, dict) \
        else len(dets)
    print(f"# live school detection [{tag}]: "
          f"{bench.N_PINGS/best:.1f} pings/s ({n} detections)", flush=True)
