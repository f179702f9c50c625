"""transfer_dtype='uint8' accuracy bound with trained weights (real chip).

Mirrors scripts/r3_tpu_session.py stage_slab_bound: run the bench fixture
survey through predict with (a) exact float32 transfer, (b) uint8 dB-code
transfer (patch mode), and (c) the serving combo slab+uint8, under a
trained recipe checkpoint; record write-mask equality, probability deltas
and the end-metric sandeel-F1 for each.  The measured numbers gate the
config_serving.yaml adoption of transfer_dtype: uint8 (same promotion
bar as infer_mode: slab, BASELINE.md).

Usage:
  python scripts/u8_bound.py --ckpt /tmp/school_ap/ckpt/best.msgpack \
      [--out /tmp/u8_bound.json]
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
    print(f"[u8_bound {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="/tmp/u8_bound.json")
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
    cfg = {"patch_size": [256, 256], "patch_overlap": 20,
           "frequencies": FREQS, "fwd_batch": 32, "depth": 5,
           "start_filts": 64, "compute_dtype": "bfloat16"}
    model = build_unet(cfg)
    payload = load_checkpoint(args.ckpt)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}

    modes = {
        "exact_f32": dict(cfg, transfer_dtype="float32"),
        "patch_u8": dict(cfg, transfer_dtype="uint8"),
        "serving_u8": dict(cfg, transfer_dtype="uint8", infer_mode="slab"),
        # + d2h probability quantization (output_dtype: uint8): codes
        # round(p*255) come back instead of f16 maps (half the d2h bytes)
        "serving_out_u8": dict(cfg, transfer_dtype="uint8",
                               infer_mode="slab", output_dtype="uint8"),
    }
    outp = {}
    for name, mcfg in modes.items():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            runner = GriddedRunner(model, variables, mcfg)
        t0 = time.time()
        chunks = {}
        for s, e, pred, _ in predict_reader(runner, reader, 1000):
            chunks[s] = np.asarray(pred, np.float32)
        outp[name] = np.concatenate(
            [chunks[s] for s in sorted(chunks)], axis=2)
        log(f"{name}: {time.time() - t0:.1f}s")

    base = outp["exact_f32"]
    written = base != 0
    lab = reader.get_label_slice(0, base.shape[2], 0, base.shape[1])
    lab = np.nan_to_num(lab.T, nan=0)
    from sklearn.metrics import precision_recall_curve
    wmask = written[0]
    y = (lab[:wmask.shape[0], :wmask.shape[1]][wmask] == 27)

    def f1_of(arr):
        prec, rec, _ = precision_recall_curve(y, arr[0][wmask])
        denom = prec + rec
        f1 = np.divide(2 * prec * rec, denom, out=np.zeros_like(denom),
                       where=denom != 0)
        return float(f1.max())

    res = {"ckpt": args.ckpt, "f1_exact_f32": round(f1_of(base), 5)}
    for name in ("patch_u8", "serving_u8", "serving_out_u8"):
        arr = outp[name]
        diff = np.abs(base - arr)[written]
        res[name] = {
            "masks_equal": bool(((base == 0) == (arr == 0)).all()),
            "mean_abs_dprob": float(diff.mean()),
            "p99_abs_dprob": float(np.percentile(diff, 99)),
            "max_abs_dprob": float(diff.max()),
            "f1": round(f1_of(arr), 5),
            "abs_dF1": round(abs(f1_of(arr) - res["f1_exact_f32"]), 5),
        }
    # isolate the OUTPUT quantization alone: vs the same serving combo
    # with f16 outputs it must obey |d| <= 1/510 (+ f16 rounding), and
    # the stored zero set may grow only by p < 1/510 pixels
    a, b = outp["serving_u8"], outp["serving_out_u8"]
    extra_zero = (b == 0) & (a != 0)
    res["output_u8_isolated"] = {
        "max_abs_dprob": float(np.abs(a - b).max()),
        "n_extra_zero": int(extra_zero.sum()),
        "max_p_at_extra_zero": float(a[extra_zero].max())
        if extra_zero.any() else 0.0,
        "abs_dF1_vs_serving_u8": round(abs(f1_of(b) - f1_of(a)), 5),
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    log(json.dumps(res))


if __name__ == "__main__":
    main()
