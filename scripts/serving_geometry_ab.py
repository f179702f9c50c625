"""Serving-preset tiling A/B: overlap 20 (reference contract, pooling-
misaligned) vs overlap 16 (stride 224, pooling-grid aligned) with
trained weights on the real chip (VERDICT r3 #5).

The serving preset (config_serving.yaml: infer_mode slab + uint8 h2d/d2h)
inherits the reference's patch 256 / overlap 20 tiling, whose stride 216
is not a multiple of 2**(depth-1)=16 — the slab pooling grid is then
misaligned with the patch grid, outputs diverge (slightly) from patch
mode at EVERY pixel, and GriddedRunner warns on every run.  overlap 16
aligns the grids (border-only divergence) at ~3.6 % more patch-grid
coverage per chunk.  This script measures, under one trained checkpoint:

  * sandeel F1 of each arm vs the exact patch-mode float32 oracle AT THE
    SAME overlap (the oracle moves with the tiling: each overlap writes a
    different pixel set);
  * divergence extent: fraction of written pixels whose slab probability
    differs from the same-overlap patch-mode u8 arm by > 2/255 (two
    output-quantization steps), plus mean/p99/max |dprob|;
  * warm end-to-end throughput of each serving arm (best of 3 passes).

Usage:
  python scripts/serving_geometry_ab.py --ckpt /tmp/school_ap/ckpt/best.msgpack
"""

import argparse
import json
import sys
import time
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FREQS = [18, 38, 120, 200]


def log(msg):
    print(f"[geom_ab {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="/tmp/serving_geometry_ab.json")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import jax
    cache = REPO / ".bench_cache" / "xla"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import bench
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.engine import load_checkpoint
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    sv_path = bench.ensure_fixture()
    reader = DataReaderZarr(sv_path)
    base_cfg = {"patch_size": [256, 256], "frequencies": FREQS,
                "fwd_batch": 32, "depth": 5, "start_filts": 64,
                "compute_dtype": "bfloat16"}
    model = build_unet(base_cfg)
    payload = load_checkpoint(args.ckpt)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}

    def make_runner(mcfg):
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            runner = GriddedRunner(model, variables, mcfg)
        warned = any("misaligned" in str(w.message) for w in wlist)
        return runner, warned

    def one_pass(runner):
        """One full-survey pass on an EXISTING runner (fresh runners pay
        seconds of re-tracing per pass — `self` is a static jit arg)."""
        chunks = {}
        t0 = time.time()
        for s, e, pred, _ in predict_reader(runner, reader, 1000):
            chunks[s] = np.asarray(pred, np.float32)
        wall = time.time() - t0
        arr = np.concatenate([chunks[s] for s in sorted(chunks)], axis=2)
        return arr, wall

    def run_predict(mcfg):
        runner, warned = make_runner(mcfg)
        arr, wall = one_pass(runner)
        return arr, wall, warned, runner

    from sklearn.metrics import precision_recall_curve

    def f1_of(arr, oracle):
        wmask = oracle[0] != 0
        lab = reader.get_label_slice(0, arr.shape[2], 0, arr.shape[1])
        lab = np.nan_to_num(lab.T, nan=0)
        y = lab[:wmask.shape[0], :wmask.shape[1]][wmask] == 27
        prec, rec, _ = precision_recall_curve(y, arr[0][wmask])
        denom = prec + rec
        f1 = np.divide(2 * prec * rec, denom, out=np.zeros_like(denom),
                       where=denom != 0)
        return float(f1.max())

    res = {"ckpt": args.ckpt}
    for tag, ov in (("ov20", 20), ("ov16", 16)):
        oracle, wall, _, _ = run_predict(dict(
            base_cfg, patch_overlap=ov, transfer_dtype="float32"))
        log(f"{tag}: patch-mode f32 oracle done ({wall:.1f}s)")
        serving = dict(base_cfg, patch_overlap=ov, infer_mode="slab",
                       transfer_dtype="uint8", output_dtype="uint8",
                       static_grid=True)
        srunner, warned = make_runner(serving)
        arr, _ = one_pass(srunner)        # compile + first pass
        walls = []
        for _ in range(args.passes):
            _, w = one_pass(srunner)
            walls.append(w)
        n_pings = arr.shape[2]
        written = oracle != 0
        # same-overlap patch-mode u8 arm isolates the slab-vs-patch
        # divergence from the input/output quantization
        patch_u8, _, _, _ = run_predict(dict(
            base_cfg, patch_overlap=ov, transfer_dtype="uint8",
            output_dtype="uint8"))
        d_slab = np.abs(arr - patch_u8)[written]
        res[tag] = {
            "stride": 256 - 2 * ov,
            "aligned": (256 - 2 * ov) % 16 == 0 and ov % 16 == 0,
            "warned": warned,
            "pings_per_sec": round(n_pings / min(walls), 1),
            "pass_walls_s": [round(w, 2) for w in walls],
            "f1_oracle": round(f1_of(oracle, oracle), 5),
            "f1_serving": round(f1_of(arr, oracle), 5),
            "abs_dF1": round(abs(f1_of(arr, oracle)
                                 - f1_of(oracle, oracle)), 5),
            "masks_equal_vs_oracle": bool(
                ((oracle == 0) == (arr == 0)).all()),
            "slab_vs_patch_u8": {
                "frac_gt_2codes": float((d_slab > 2 / 255).mean()),
                "mean_abs_dprob": float(d_slab.mean()),
                "p99_abs_dprob": float(np.percentile(d_slab, 99)),
                "max_abs_dprob": float(d_slab.max()),
            },
        }
        log(f"{tag}: {json.dumps(res[tag])}")

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    log(f"results -> {args.out}")


if __name__ == "__main__":
    main()
