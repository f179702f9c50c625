"""Docker/production entry point.

Env-var contract of the reference dockerscript
(crimac_unet/dockerscript.py:7-82): reads MODEL / DATA / SURVEY / CONFIG
dirs + file names from the environment, converts config kHz frequencies to
Hz for zarr surveys that store Hz, and writes ``<OUTPUT>/<PRED_FILE>``
predictions for one survey.

    MODELWEIGHTS  checkpoint file (.msgpack or reference .pt)
    SURVEY        path to <name>_sv.zarr
    CONFIG        yaml config path
    PRED_FILE     output zarr dir name
    OUTPUT_DIR    output directory
"""

from __future__ import annotations

import os
import time

from ..config import load_yaml_config, parse_config_options
from ..data.zarr_reader import DataReaderZarr
from ..models.unet import build_unet
from ..utils.general import fix_seeds
from .engine import load_checkpoint
from .inference import GriddedRunner, save_survey_predictions_zarr


def main():
    start = time.time()
    model_path = os.environ["MODELWEIGHTS"]
    survey_path = os.environ["SURVEY"]
    config_path = os.environ.get("CONFIG")
    output_dir = os.environ.get("OUTPUT_DIR", ".")
    pred_file = os.environ.get("PRED_FILE", "predictions.zarr")

    config = parse_config_options(load_yaml_config(config_path)
                                  if config_path else {}, None)
    fix_seeds(config["random_seed"])

    reader = DataReaderZarr(survey_path)
    # zarr production data stores Hz; configs use kHz (dockerscript.py:58-60)
    if all(f > 10000 for f in reader.frequencies):
        config["frequencies"] = [f * 1000 for f in config["frequencies"]]

    payload = load_checkpoint(model_path)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    runner = GriddedRunner(build_unet(config), variables, config)

    target = os.path.join(output_dir, pred_file)
    save_survey_predictions_zarr(
        runner, reader, target,
        preload_n_pings=config["preload_n_pings"],
        resume_writing=config["resume_writing"],
        model_name="docker", progress=True)
    print(f"Executed time (hours): {(time.time() - start) / 3600:.2f}")


if __name__ == "__main__":
    main()
