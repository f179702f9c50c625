"""Trained-weights school-detection AP measurement (real chip).

Trains the reference recipe (bf16 default) on the r3 measurement
fixture (train year 2017, HELD-OUT validation year 2016), then runs
pipeline/school_eval.py on the validation survey with the trained
checkpoint — demonstrating the detection metric on real signal (the CLI
demos use random-init weights, which detect nothing).

Usage:
  python scripts/school_ap_trained.py [--iterations 15000] \
      [--work /tmp/school_ap] [--out /tmp/school_ap/results.json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FREQS = [18, 38, 120, 200]


def log(msg):
    print(f"[school_ap {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def ensure_big_val_fixture(work):
    """Statistically meaningful HELD-OUT validation survey (VERDICT r3
    #4: the r3 measurement fixture carried ~7 ground-truth schools per
    category, quantizing AP to 1/7-recall steps).  School sizes scale
    with each echogram's W, so MANY SMALL echograms — not one wide one —
    is what yields many distinct school components: 14 x (700x400)
    echograms x 12 schools gives >= 50 per category (recall resolution
    <= 1/50), same year/naming contract as the r3 fixture."""
    from pathlib import Path

    from crimac_unet_tpu.data.fixtures import make_survey_dir
    memm = Path(work) / "memm_bigval"
    if not (memm / "marker.ok").is_file():
        make_survey_dir(memm, year=2016, n_echograms=14, H=700, W=400,
                        seed=77, n_schools=12)
        (memm / "marker.ok").write_text("ok")
    return str(memm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=15000)
    ap.add_argument("--work", default="/tmp/school_ap")
    ap.add_argument("--out", default=None)
    ap.add_argument("--big-val", action="store_true",
                    help="evaluate on the >=50-schools-per-category "
                         "held-out fixture instead of the r3 2-echogram "
                         "one (AP resolution 1/50 vs 1/7)")
    args = ap.parse_args()
    out = args.out or os.path.join(args.work, "results.json")
    os.makedirs(args.work, exist_ok=True)

    import jax
    cache = REPO / ".bench_cache" / "xla"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # SAME fixture and recipe as the r3 measurement session — import,
    # don't copy, so the BASELINE.md comparability cannot silently drift
    from scripts.r3_tpu_session import ensure_train_fixture, recipe_config
    memm = ensure_train_fixture(args.work)
    config = dict(recipe_config(memm, "bfloat16"),
                  iterations=args.iterations,
                  log_step=max(args.iterations // 6, 1))

    from crimac_unet_tpu.pipeline.train import run_training
    ckpt_dir = Path(args.work) / "ckpt"
    t0 = time.time()
    segpipe = run_training(config, str(ckpt_dir), progress=False)
    train_min = (time.time() - t0) / 60
    log(f"trained {int(segpipe.state.step)} steps in {train_min:.1f} min, "
        f"best F1 {segpipe.best_F1_val:.4f}")

    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.engine import load_checkpoint
    from crimac_unet_tpu.pipeline.inference import GriddedRunner
    from crimac_unet_tpu.pipeline.school_eval import school_eval_survey

    payload = load_checkpoint(str(ckpt_dir / "best.msgpack"))
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    cfg = dict(config, fwd_batch=32, compute_dtype="bfloat16")
    runner = GriddedRunner(build_unet(cfg), variables, cfg)
    val_dir = ensure_big_val_fixture(args.work) if args.big_val else memm
    readers = get_echograms(years=[2016],
                            path_to_echograms=str(val_dir),
                            minimum_shape=50)
    log(f"validation survey: {len(readers)} echograms")
    t0 = time.time()
    m = school_eval_survey(runner, readers, preload_n_pings=1000,
                           prob_threshold=0.5,
                           save_path_metrics=os.path.join(
                               args.work, "2016_school_eval.csv"),
                           save_path_detections=os.path.join(
                               args.work, "2016_schools.csv"))
    eval_s = time.time() - t0
    for cname, cm in m["categories"].items():
        log(f"[{cname}] AP@.25/.5/.75 = "
            + "/".join(f"{a:.3f}" for a in cm["ap"])
            + f", recall {cm['recall'][0]:.3f}@.25, "
              f"{cm['n_detections']} det / {cm['n_gt']} gt")
    log(f"survey mAP {m['mean_ap']:.4f} ({eval_s:.1f}s)")

    res = {"best_F1": float(segpipe.best_F1_val),
           "train_min": round(train_min, 2),
           "steps": int(segpipe.state.step),
           "mean_ap": m["mean_ap"],
           "categories": m["categories"],
           "eval_s": round(eval_s, 1)}
    with open(out, "w") as f:
        json.dump(res, f, indent=1, default=float)
    log(f"results -> {out}")


if __name__ == "__main__":
    main()
