"""Fast-training recipe A/B on the real chip.

The r3 train-step decomposition (BASELINE.md) showed training MFU is
bounded by the reference recipe's batch 4-8 (small-batch forward
efficiency), so the remaining lever is recipe-level: train the SAME
sample budget (15000 x 4 = 60000 crops) at batch 16 with linearly
scaled LR (0.005 -> 0.02) and proportionally scaled schedule
(lr_step 1000 -> 250 optimizer steps keeps the same decay-per-sample;
log_step 2500 -> 625 keeps six validations; test_iter 1000 -> 250
keeps the validation pixel count).  Reference recipe:
configs/config_baseline.yaml:25-40, pipeline_train_predict/
pipeline.py:135-141,156-157.

Compares wall-clock and best held-out F1 against the recorded bf16
batch-4 baseline (14.3-15.0 min, F1 0.707-0.716 across sessions) on
the identical fixture and seed.

  python scripts/fast_recipe.py [--arms b16,b16_sqrt,b32] [--out f.json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from r3_tpu_session import ensure_train_fixture, log, recipe_config, save


def fast_config(memm, batch, lr):
    """Equal-sample-budget scaling of the reference recipe."""
    cfg = recipe_config(memm, "bfloat16")
    scale = batch // cfg["batch_size"]  # 4 -> batch
    cfg["batch_size"] = batch
    cfg["lr"] = lr
    cfg["iterations"] = 15000 // scale
    cfg["lr_step"] = 1000 // scale
    cfg["log_step"] = 2500 // scale
    cfg["test_iter"] = 1000 // scale
    return cfg


ARMS = {
    # linear LR scaling (Goyal et al.): lr x4 at batch x4
    "b16": lambda memm: fast_config(memm, 16, 0.02),
    # sqrt scaling fallback if linear diverges at these class weights
    "b16_sqrt": lambda memm: fast_config(memm, 16, 0.01),
    "b32": lambda memm: fast_config(memm, 32, 0.04),
}


def run_arm(work, out, arm):
    from crimac_unet_tpu.pipeline.train import run_training
    memm = ensure_train_fixture(work)
    cfg = ARMS[arm](memm)
    ckpt = Path(work) / f"ckpt_fast_{arm}"
    t0 = time.time()
    segpipe = run_training(cfg, str(ckpt), progress=False)
    wall = time.time() - t0
    save(out, f"fast_{arm}", {
        "best_F1": float(segpipe.best_F1_val),
        "wall_min": round(wall / 60, 2),
        "steps": int(segpipe.state.step),
        "batch": cfg["batch_size"], "lr": cfg["lr"],
        "samples": cfg["batch_size"] * cfg["iterations"],
        "ckpt": str(ckpt / "best.msgpack")})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="b16")
    ap.add_argument("--work", default="/tmp/fast_recipe")
    ap.add_argument("--out", default="/tmp/fast_recipe/results.json")
    a = ap.parse_args()
    os.makedirs(a.work, exist_ok=True)
    for arm in a.arms.split(","):
        if arm not in ARMS:
            raise SystemExit(f"unknown arm {arm}")
        log(f"=== arm {arm}")
        run_arm(a.work, a.out, arm)
    log("done")


if __name__ == "__main__":
    main()
