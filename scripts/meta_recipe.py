"""Metadata-model training convergence on the real chip.

Trains the reference's EARLY-meta-inject model (4 acoustic + 7 metadata
input channels, config_meta_train.yaml semantics) end-to-end on TPU with
the pooled on-device meta path (scripts/pooled_meta_bench.py: 9.0x over
host crops), at the fast-recipe shape (batch 16, the reference's
60,000-crop sample budget, linear-scaled LR/schedule — BASELINE.md r3),
on the same fixture/seed as the r3 convergence A/Bs.

The synthetic fixture's labels carry no real metadata signal, so the
expected result is F1 INSIDE the no-meta band (0.707-0.716) at a
comparable wall — i.e. the meta family trains to convergence on the
chip without breaking the recipe, with the meta math free on device.

  python scripts/meta_recipe.py [--late] [--out f.json]
"""

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from fast_recipe import fast_config
from r3_tpu_session import ensure_train_fixture, log, save

ALL_META = {"portion_year": True, "portion_day": True, "depth_rel": True,
            "depth_abs_surface": True, "depth_abs_seabed": True,
            "time_diff": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--late", action="store_true",
                    help="late per-pixel-MLP injection instead of early")
    ap.add_argument("--work", default="/tmp/meta_recipe")
    ap.add_argument("--out", default="/tmp/meta_recipe/results.json")
    a = ap.parse_args()
    os.makedirs(a.work, exist_ok=True)

    from crimac_unet_tpu.pipeline.train import run_training
    memm = ensure_train_fixture(a.work)
    # sqrt LR scaling (r5): the linear-scaled 0.02 proved unstable at
    # these class weights (docs/SESSIONS.md round 5 fast-train session)
    cfg = fast_config(memm, 16, 0.01)
    cfg["meta_channels"] = dict(ALL_META)
    cfg["late_meta_inject"] = bool(a.late)
    arm = "late" if a.late else "early"
    ckpt = Path(a.work) / f"ckpt_meta_{arm}"
    log(f"=== meta recipe ({arm} inject), batch 16, pooled")
    t0 = time.time()
    segpipe = run_training(cfg, str(ckpt), progress=False)
    wall = time.time() - t0
    pooled = (segpipe.pool is not None
              and segpipe.pool.meta_vectors is not None)
    save(a.out, f"meta_{arm}", {
        "best_F1": float(segpipe.best_F1_val),
        "wall_min": round(wall / 60, 2),
        "steps": int(segpipe.state.step),
        "pooled_meta": pooled,
        "samples": cfg["batch_size"] * cfg["iterations"],
        "ckpt": str(ckpt / "best.msgpack")})
    if not pooled:
        log("WARNING: pooled meta path did not engage")
    log("done")


if __name__ == "__main__":
    main()
