"""Docker/production entry point.

Honours the reference container contract (crimac_unet/dockerscript.py:1-82):

    env MODEL    -> /model/<MODEL>            checkpoint (.msgpack or .pt)
    env SURVEY   -> /datain/<SURVEY>/ACOUSTIC/GRIDDED/<SURVEY>_sv.zarr
    env CONFIG   -> /configs/<CONFIG>         yaml config
    env ZARRFILE -> /dataout/<ZARRFILE>       prediction store

with the config's kHz frequencies converted to Hz for zarr survey data
(dockerscript.py:58-60).  Generalized overrides for non-container use:
MODELWEIGHTS / SURVEY_PATH / CONFIG_PATH / OUTPUT_DIR / PRED_FILE.
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
from .save_predict import should_save_labels


def resolve_paths() -> dict:
    """Reference mount-point layout with generalized overrides."""
    if os.environ.get("MODELWEIGHTS"):
        return {
            "model": os.environ["MODELWEIGHTS"],
            "sv": os.environ["SURVEY_PATH"],
            "config": os.environ.get("CONFIG_PATH"),
            "target": os.path.join(os.environ.get("OUTPUT_DIR", "."),
                                   os.environ.get("PRED_FILE",
                                                  "predictions.zarr")),
        }
    survey = os.environ["SURVEY"]
    return {
        "model": os.path.join("/model", os.environ["MODEL"]),
        "sv": os.path.join("/datain", survey, "ACOUSTIC", "GRIDDED",
                           f"{survey}_sv.zarr"),
        "config": os.path.join("/configs", os.environ["CONFIG"]),
        "target": os.path.join("/dataout", os.environ["ZARRFILE"]),
    }


def main():
    start = time.time()
    paths = resolve_paths()
    print("Files:")
    for k, v in paths.items():
        print(f"  {k}: {v}")

    # `or {}` twice: an UNSET config path and an EMPTY/comments-only
    # YAML (safe_load returns None) are both legal all-defaults configs
    raw_yaml = (load_yaml_config(paths["config"]) or {}) \
        if paths["config"] else {}
    config = parse_config_options(raw_yaml, None)
    fix_seeds(config["random_seed"])

    reader = DataReaderZarr(paths["sv"])
    # zarr production data stores Hz; configs use kHz (dockerscript.py:58-60)
    # — the len guard keeps a malformed empty frequency coordinate from
    # vacuously triggering the conversion and masking the real error
    if len(reader.frequencies) and all(f > 10000
                                       for f in reader.frequencies):
        config["frequencies"] = [f * 1000 for f in config["frequencies"]]

    payload = load_checkpoint(paths["model"])
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    runner = GriddedRunner(build_unet(config), variables, config)

    # container output contract: the reference dockerscript writes ONLY
    # predictions.  save_labels defaults True in the shared config
    # schema, so honor it here only when the mounted YAML sets the key
    # EXPLICITLY — an implicit default must not grow the production
    # store an extra array (and break resumes of label-less stores)
    save_labels = ("save_labels" in raw_yaml
                   and should_save_labels(config, reader))
    save_survey_predictions_zarr(
        runner, reader, paths["target"],
        preload_n_pings=config["preload_n_pings"],
        resume_writing=config["resume_writing"],
        model_name="docker", progress=True,
        save_labels=save_labels)
    print(f"Executed time (hours): {(time.time() - start) / 3600:.2f}")


if __name__ == "__main__":
    main()
