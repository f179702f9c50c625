"""50k-ping streaming-predict soak (production scale, one chip).

Builds (once, cached under /tmp/soak50k) a 50,000-ping x 1000-range
4-frequency Blosc survey (~12.5x the bench fixture) and streams a full
save_survey_predictions_zarr run in the requested infer_mode, reporting
wall, pings/s, peak host RSS and the per-phase timers.  Round-2 measured
158.7 s / 315 pings/s / 1.26 GB RSS in patch mode with the old
three-pass host slab assembly; this re-measures with the native
decode+scatter path and the slab mode.

  python scripts/soak50k.py [patch|slab|eval]

``eval`` streams evaluate_reader (full test label chain + PR histogram,
no zarr writes) instead of predict; optional second arg picks the
transfer dtype (default uint8 — the fastest measured eval path):

  python scripts/soak50k.py eval [uint8|bfloat16|float32]
"""

import os
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PINGS, N_RANGE = 50_000, 1000


def ensure_fixture():
    root = Path("/tmp/soak50k")
    sv = root / "S2017843_sv.zarr"
    ok = root / "S2017843.ok"   # marker written after a COMPLETE build
    if sv.is_dir() and ok.is_file():
        return str(sv)
    root.mkdir(exist_ok=True)
    import shutil
    for stale in root.glob("S2017843_*"):
        shutil.rmtree(stale, ignore_errors=True)
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    t = time.time()
    path = make_zarr_survey(root, year=2017, n_echograms=1, H=N_RANGE,
                            W=N_PINGS, seed=9, n_schools=200)
    ok.touch()
    print(f"fixture built in {time.time() - t:.0f}s -> {path}",
          flush=True)
    return path


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "patch"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    import warnings

    import jax.numpy as jnp

    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (
        GriddedRunner, save_survey_predictions_zarr)

    sv = ensure_fixture()
    reader = DataReaderZarr(sv)
    is_eval = mode == "eval"
    td = (sys.argv[2] if len(sys.argv) > 2 else "uint8") if is_eval \
        else "bfloat16"
    cfg = {"patch_size": [256, 256], "patch_overlap": 20,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 32,
           "depth": 5, "start_filts": 64, "compute_dtype": "bfloat16",
           "infer_mode": "patch" if is_eval else mode,
           "transfer_dtype": td}
    model = build_unet(cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 256, 256, 4)), train=False))(
        jax.random.PRNGKey(0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = GriddedRunner(model, variables, cfg)

    t0 = time.time()
    if is_eval:
        import numpy as np

        from crimac_unet_tpu.ops import metrics as M
        from crimac_unet_tpu.pipeline.inference import evaluate_reader
        hist = np.asarray(evaluate_reader(runner, reader,
                                          M.new_histogram()))
        tag = f"eval/{td}: scored {hist.sum():.3e} px"
    else:
        out = f"/tmp/soak50k/pred_{mode}.zarr"
        save_survey_predictions_zarr(runner, reader, out,
                                     preload_n_pings=1000, progress=False)
        tag = f"mode={mode}"
    wall = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"soak {tag}: {wall:.1f}s  "
          f"{N_PINGS / wall:.0f} pings/s  peak RSS {rss_gb:.2f} GB",
          flush=True)
    for name, st in sorted(runner.timer.summary().items()):
        print(f"  {name:16s} total {st['total_s']:8.1f}s  n={st['n']}",
              flush=True)


if __name__ == "__main__":
    main()
