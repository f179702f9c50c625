"""Evaluation entry point.

    python -m crimac_unet_tpu.pipeline.evaluate --yaml_path ... \
        --checkpoint_path ... --save_path_metrics ... --save_path_plot ...

Reference surface (pipeline_train_predict/evaluate.py:120-167): per
evaluation survey, sliding-window metrics in the configured eval mode
(all/region/fish->trace) written as ``<survey>_test.csv`` + ``<survey>_pr.png``
under ``<save_path>/<experiment>/<checkpoint-run>/``.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

from ..config import (get_argparse_parser, load_yaml_config,
                      parse_config_options)
from ..data.partition import make_partition
from ..models.unet import build_unet
from ..ops import metrics as M
from ..utils.general import fix_seeds
from .inference import GriddedRunner, evaluate_reader, grid_height_for_reader
from .segpipe import save_metrics_dict, save_pr_plot

from ..constants import EVAL_MODE_MAP as _MODE_MAP  # 'fish' -> 'trace'


def evaluate_survey(runner, readers, eval_mode, save_path_metrics=None,
                    save_path_plot=None, progress=False):
    """One PR curve per survey over all its readers
    (reference evaluate.py:39-117 concatenates readers into one metric)."""
    hist = M.new_histogram()
    readers = list(readers)
    # static_grid: pad every reader's grid to the survey-max height so the
    # whole survey shares ONE compiled eval program (memm surveys run one
    # evaluate_reader per echogram, each with its own seabed-derived grid
    # height — one XLA compile per echogram otherwise). Histogram-exact:
    # pad-row patches are force-ignored (inference.evaluate_reader).
    fixed_R = None
    if getattr(runner, "static_grid", False) and readers:
        # reads hit the reader-level seabed caches, so evaluate_reader's
        # own get_seabed pass right after costs no second store decode
        wh = runner.window[0]
        fixed_R = max(grid_height_for_reader(r, wh, runner.overlap)
                      for r in readers)
    for reader in readers:
        hist = evaluate_reader(runner, reader, hist,
                               eval_mode=_MODE_MAP[eval_mode],
                               progress=progress, fixed_R=fixed_R)
    curve = M.pr_curve_from_histogram(np.asarray(hist))
    if save_path_metrics is not None:
        save_metrics_dict(curve, save_path_metrics)
    if save_path_plot is not None:
        save_pr_plot(curve, save_path_plot)
    f1, _ = M.max_f1(curve)
    print(f"F1 score: {f1}")
    return curve


def main(argv=None):
    args = get_argparse_parser("eval").parse_args(argv)
    configuration = load_yaml_config(args.yaml_path)
    config = parse_config_options(configuration, args)
    experiment_name = Path(config["yaml_path"]).stem

    fix_seeds(config["random_seed"])

    from .engine import load_checkpoint
    payload = load_checkpoint(config["checkpoint_path"])
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = build_unet(config)
    runner = GriddedRunner(model, variables, config)

    print(f'\nLoading {config["data_mode"]} data partition object...')
    start = time.time()
    data_obj = make_partition(config)
    print("Executed time for loading data partition object (min):"
          f" {np.round((time.time() - start) / 60, 2)}")

    parts = os.path.normpath(str(config["checkpoint_path"])).split(
        os.path.sep)
    # a bare filename has no run directory; fall back to its stem (the
    # parent of a root-level path is the empty string — also fall back)
    run_id = parts[-2] if len(parts) >= 2 and parts[-2] else \
        os.path.splitext(parts[-1])[0]
    metrics_dir = os.path.join(str(config["save_path_metrics"]),
                               experiment_name, run_id)
    plot_dir = os.path.join(str(config["save_path_plot"]),
                            experiment_name, run_id)
    os.makedirs(metrics_dir, exist_ok=True)
    os.makedirs(plot_dir, exist_ok=True)
    print("Metrics directory:", metrics_dir)
    print("Plot directory:", plot_dir, "\n")

    for survey in data_obj.get_evaluation_surveys():
        readers = data_obj.get_survey_readers(survey)
        print("Running evaluation for", survey)
        evaluate_survey(
            runner, readers, config["eval_mode"],
            save_path_metrics=os.path.join(metrics_dir,
                                           f"{survey}_test.csv"),
            save_path_plot=os.path.join(plot_dir, f"{survey}_pr.png"),
            progress=True)


if __name__ == "__main__":
    main()
