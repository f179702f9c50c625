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

import numpy as np

from ..ops import metrics as M
from .inference import evaluate_reader, grid_height_for_reader
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
    from .cli_common import load_eval_context

    ctx = load_eval_context("eval", argv, want_plots=True)
    for survey in ctx.data_obj.get_evaluation_surveys():
        readers = ctx.data_obj.get_survey_readers(survey)
        print("Running evaluation for", survey)
        evaluate_survey(
            ctx.runner, readers, ctx.config["eval_mode"],
            save_path_metrics=os.path.join(ctx.metrics_dir,
                                           f"{survey}_test.csv"),
            save_path_plot=os.path.join(ctx.plot_dir, f"{survey}_pr.png"),
            progress=True)


if __name__ == "__main__":
    main()
