"""Trained-weights accuracy bound for quantized-transfer EVALUATION.

Companion to scripts/u8_bound.py (which bounds the predict path): runs
evaluate_reader on the bench fixture with a trained recipe checkpoint at
transfer_dtype float32 / bfloat16 / uint8 and records the max-F1 of each,
plus the exact label-chain invariants (scored-pixel count, positive
split).  Numbers recorded in BASELINE.md.

Usage:
  python scripts/eval_u8_bound.py --ckpt /tmp/school_ap/ckpt/best.msgpack
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="/tmp/eval_u8_bound.json")
    args = ap.parse_args()

    import jax
    cache = REPO / ".bench_cache" / "xla"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.ops import metrics as M
    from crimac_unet_tpu.pipeline.engine import load_checkpoint
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    evaluate_reader)

    sv_path = bench.ensure_fixture()
    reader = DataReaderZarr(str(sv_path))
    cfg = {"patch_size": [256, 256], "patch_overlap": 20,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 32, "depth": 5,
           "start_filts": 64, "compute_dtype": "bfloat16"}
    model = build_unet(cfg)
    payload = load_checkpoint(args.ckpt)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}

    out = {}
    hists = {}
    for td in ("float32", "bfloat16", "uint8"):
        runner = GriddedRunner(model, variables,
                               dict(cfg, transfer_dtype=td))
        t0 = time.time()
        h = np.asarray(evaluate_reader(runner, reader, M.new_histogram()))
        dt = time.time() - t0
        hists[td] = h
        f1, thr = M.max_f1(M.pr_curve_from_histogram(h))
        out[td] = {"max_f1": float(f1), "n_scored": int(h.sum()),
                   "n_pos": int(h[0].sum()),
                   "first_pass_s": round(dt, 1)}
        print(f"# {td}: F1={f1:.5f} scored={h.sum()} pos={h[0].sum()} "
              f"({dt:.1f}s)", flush=True)

    h32 = hists["float32"]
    for td in ("bfloat16", "uint8"):
        assert hists[td].sum() == h32.sum(), td
        assert hists[td][0].sum() == h32[0].sum(), td
        out[td]["dF1_vs_float32"] = out[td]["max_f1"] - out["float32"]["max_f1"]
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
