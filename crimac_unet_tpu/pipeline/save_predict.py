"""Prediction-saving entry point.

    python -m crimac_unet_tpu.pipeline.save_predict --yaml_path ... \
        --checkpoint_path ... --save_predictions_path ...

Reference surface (pipeline_train_predict/save_predict.py:268-330): per
``save_prediction_surveys`` survey, sliding-window softmax predictions
written per reader as ``<name>_pred.zarr`` (zarr mode, resume/append
supported) or ``<name>_pred.npy`` (memmap mode).
"""

from __future__ import annotations

import os
from pathlib import Path

from ..config import (get_argparse_parser, load_yaml_config,
                      parse_config_options)
from ..data.partition import make_partition
from ..models.unet import build_unet
from ..utils.general import fix_seeds
from .engine import load_checkpoint
from .inference import (GriddedRunner, save_reader_predictions_memm,
                        save_survey_predictions_zarr)


def run_save_predictions(config, runner, data_obj, predictions_dir,
                         progress=False):
    if not config.get("save_prediction_surveys"):
        # an empty survey list used to exit 0 with only a timer report —
        # reading as a completed prediction run that wrote nothing
        print("WARNING: save_prediction_surveys is empty — nothing to "
              "predict; set it in the YAML (year numbers, e.g. [2017])")
        return
    for survey in config["save_prediction_surveys"]:
        readers = data_obj.get_survey_readers(survey)
        print(f"Saving predictions for survey {survey}, "
              f"{len(readers)} data reader(s)")
        # static_grid on multi-reader (memm) surveys: compile the grid at
        # the survey-wide max height/width so every echogram shares ONE
        # predict program (per-reader grids would still recompile once per
        # distinct bathymetry/ping-count — the exact churn static_grid
        # exists to remove).  Outputs stay semantically bit-identical:
        # the extra pad rows/columns are discarded like each reader's
        # own static pad (on TPU, f16-ulp conv-tiling shifts where the
        # compiled sub-batch shape changes — predict_reader docstring).
        fixed_R = fixed_C = None
        if getattr(runner, "static_grid", False) and len(readers) > 1:
            from .inference import static_grid_shape_for_reader
            dims = [static_grid_shape_for_reader(
                        r, runner.window, runner.overlap,
                        config["preload_n_pings"]) for r in readers]
            fixed_R = max(d[0] for d in dims)
            fixed_C = max(d[1] for d in dims)
        for reader in readers:
            if config["data_mode"] == "memm":
                target = os.path.join(predictions_dir,
                                      reader.name + "_pred.npy")
                save_reader_predictions_memm(
                    runner, reader, target,
                    preload_n_pings=config["preload_n_pings"],
                    resume_writing=config["resume_writing"],
                    progress=progress, fixed_R=fixed_R, fixed_C=fixed_C)
            else:
                target = os.path.join(predictions_dir,
                                      reader.name + "_pred.zarr")
                save_survey_predictions_zarr(
                    runner, reader, target,
                    preload_n_pings=config["preload_n_pings"],
                    resume_writing=config["resume_writing"],
                    model_name=runner_model_name(config),
                    progress=progress,
                    save_labels=should_save_labels(config, reader),
                    fixed_R=fixed_R, fixed_C=fixed_C)


def should_save_labels(config, reader) -> bool:
    """save_labels gating shared by the CLI and docker entries: the
    config must ask for it, labels must be declared available, AND the
    reader must actually carry an annotation store — a production mount
    shipping only _sv.zarr would otherwise emit an all-background
    'labels' array that reads as real annotation (review finding r3)."""
    if not (config.get("save_labels")
            and config.get("labels_available", True)):
        return False
    if reader.data_format == "zarr" and \
            getattr(reader, "annotation", None) is None:
        print(f"{reader.name}: no labels store — skipping save_labels")
        return False
    return True


def runner_model_name(config):
    return Path(config["yaml_path"]).stem if "yaml_path" in config else \
        "model"


def main(argv=None):
    args = get_argparse_parser("save_predict").parse_args(argv)
    configuration = load_yaml_config(args.yaml_path)
    config = parse_config_options(configuration, args)

    predictions_dir = str(config["save_predictions_path"])
    os.makedirs(predictions_dir, exist_ok=True)

    fix_seeds(config["random_seed"])
    payload = load_checkpoint(config["checkpoint_path"])
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = build_unet(config)
    runner = GriddedRunner(model, variables, config)

    data_obj = make_partition(config)
    # device-trace capture when CRIMAC_PROFILE_DIR is set (SURVEY.md §5
    # tracing: jax.profiler traces are first-class here)
    from ..utils.profiling import device_trace
    with device_trace() as trace_dir:
        run_save_predictions(config, runner, data_obj, predictions_dir,
                             progress=True)
    if trace_dir:
        print(f"profiler trace written to {trace_dir}")
    print(runner.timer.report())


if __name__ == "__main__":
    main()
