"""Measure static_grid's compile-churn saving on the real TPU.

A mixed-bathymetry memm survey (three echograms with different range
extents, seabed depths and ping counts, so per-chunk grid height R, tail
width C and per-reader n_range all churn) is predicted end-to-end twice —
``static_grid: false`` then ``true`` — each in a FRESH subprocess so
XLA's in-process program cache cannot leak between arms.  Reported per
arm: distinct compiled-program signatures for the two predict-path jit
programs, cold (first-pass) wall, and output equality.

Every distinct signature is one fused-predict XLA compile; through the
axon tunnel a fresh compile of the depth-5/64 program costs minutes
(BASELINE.md: 162-663 s weather spread), so on real multi-echogram
surveys the dynamic grid pays that per distinct bathymetry bucket while
static_grid pays it once.

Usage:  python scripts/static_grid_tpu.py            (parent: both arms)
        python scripts/static_grid_tpu.py --arm 0|1  (one arm, JSON out)
"""

import datetime as dt
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

FIXTURE = REPO / ".bench_cache" / "static_grid_survey"
PATCH = 256
OVERLAP = 20
PRELOAD = 1000
# (n_range, n_pings, seabed_frac): three echograms, mixed depths/extents.
# fracs chosen so per-chunk R churns (0.3 -> shallow grid, 0.9 -> deep)
ECHOS = [(1100, 2600, 0.35), (900, 2600, 0.9), (1100, 1500, 0.6)]


def ensure_fixture():
    ok = FIXTURE / ".ok"
    params = f"{ECHOS} seed=5"
    if ok.is_file() and ok.read_text() == params:
        return
    import shutil

    from crimac_unet_tpu.data.fixtures import (make_synthetic_echogram,
                                               write_memmap_echogram)
    if FIXTURE.exists():
        shutil.rmtree(FIXTURE)
    FIXTURE.mkdir(parents=True)
    rng = np.random.RandomState(5)
    for i, (H, W, frac) in enumerate(ECHOS):
        d = dt.date(2017, 4, 27) + dt.timedelta(days=i)
        name = f"2017843-D{d:%Y%m%d}-T0626{i:02d}"
        data, labels, heave, _ = make_synthetic_echogram(
            H, W, rng, n_schools=6, seabed_frac=frac)
        write_memmap_echogram(str(FIXTURE), name, data, labels, heave,
                              [18, 38, 120, 200])
    ok.write_text(params)


def run_arm(static: bool):
    import jax

    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import GriddedRunner
    from crimac_unet_tpu.pipeline.save_predict import run_save_predictions

    cfg = dict(
        frequencies=[18, 38, 120, 200], patch_size=[PATCH, PATCH],
        patch_overlap=OVERLAP, preload_n_pings=PRELOAD, depth=5,
        start_filts=64, meta_channels=[], late_meta_inject=False,
        compute_dtype="bfloat16", data_mode="memm", resume_writing=False,
        save_labels=False, save_prediction_surveys=[2017],
        static_grid=static, fwd_batch=32, mesh_devices=1)

    model = build_unet(cfg)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, np.zeros((1, PATCH, PATCH, 4), np.float32),
                   train=False)

    class Data:
        def get_survey_readers(self, survey):
            return get_echograms(years=[2017],
                                 path_to_echograms=str(FIXTURE),
                                 frequencies=[18, 38, 120, 200])

    runner = GriddedRunner(model, v, cfg)
    pp_sigs, mo_sigs = [], []
    real_pp, real_mo = runner._predict_patches, runner._mask_output

    def spy_pp(variables, data_slab, y0s, x0s, border_slab, meta_slab,
               consts, R, C, border_zero, use_meta=False):
        pp_sigs.append((R, C, data_slab.shape))
        return real_pp(variables, data_slab, y0s, x0s, border_slab,
                       meta_slab, consts, R, C, border_zero, use_meta)

    def spy_mo(stitched, lab_bits, data_slab, sb_row, nr,
               n_pings, zarr_pad, chunk_w):
        mo_sigs.append((nr, n_pings, chunk_w, stitched.shape))
        return real_mo(stitched, lab_bits, data_slab, sb_row,
                       nr, n_pings, zarr_pad, chunk_w)

    runner._predict_patches, runner._mask_output = spy_pp, spy_mo

    out = Path(os.environ["STATIC_GRID_OUT"])
    t0 = time.time()
    run_save_predictions(cfg, runner, Data(), str(out))
    cold_wall = time.time() - t0

    pings = sum(W for _, W, _ in ECHOS)
    return dict(static=static, cold_wall_s=round(cold_wall, 2),
                pings_per_sec_cold=round(pings / cold_wall, 1),
                n_chunks=len(pp_sigs),
                distinct_predict_sigs=sorted(
                    {(r, c) for r, c, _ in pp_sigs}),
                distinct_mask_sigs=sorted({s[:3] for s in mo_sigs}))


def main():
    if "--arm" in sys.argv:
        static = bool(int(sys.argv[sys.argv.index("--arm") + 1]))
        print("ARM_JSON " + json.dumps(run_arm(static)), flush=True)
        return

    ensure_fixture()
    results = {}
    # STATIC ARM FIRST: the axon server caches compiled programs across
    # client processes (measured — a shape the dynamic arm had compiled
    # came back in seconds for the static arm), so whichever arm runs
    # second gets its shared shapes for free.  Static-first biases
    # AGAINST static_grid: it pays its single compile truly cold, while
    # the dynamic arm may reuse the static shape for its tallest chunks.
    for arm in (1, 0):
        out = FIXTURE.parent / f"static_grid_out_{arm}"
        if out.exists():
            import shutil
            shutil.rmtree(out)
        out.mkdir(parents=True)
        env = dict(os.environ, STATIC_GRID_OUT=str(out))
        env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + \
            env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, __file__, "--arm", str(arm)],
            env=env, capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            print(proc.stdout[-4000:])
            print(proc.stderr[-4000:])
            raise SystemExit(f"arm {arm} failed")
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("ARM_JSON ")][-1]
        results[arm] = json.loads(line[len("ARM_JSON "):])

    dyn, sta = results[0], results[1]
    # outputs: write masks must be identical; probabilities may move at
    # f16-ulp level between arms ON TPU because a different compiled
    # sub-batch shape tiles the convs differently (bit-identical on CPU,
    # and on TPU whenever the chunk's compiled shape matches — see
    # tests/test_inference_parity.py static_grid suite)
    worst = 0.0
    masks_equal = True
    for f in sorted((FIXTURE.parent / "static_grid_out_0").glob("*.npy")):
        a = np.load(f)
        b = np.load(FIXTURE.parent / "static_grid_out_1" / f.name)
        a, b = np.nan_to_num(a, nan=-1.0), np.nan_to_num(b, nan=-1.0)
        masks_equal &= bool(((a != 0) == (b != 0)).all())
        worst = max(worst, float(np.abs(
            a.astype(np.float64) - b.astype(np.float64)).max()))
    print(json.dumps(dict(
        dynamic=dyn, static=sta, write_masks_identical=masks_equal,
        max_abs_prob_diff=worst), indent=2))
    if not masks_equal or worst > 4e-3:
        raise SystemExit("OUTPUT MISMATCH between arms beyond f16-ulp")


if __name__ == "__main__":
    main()
