"""Docker entry point via the generalized env contract + multi-survey
batch prediction."""

import os

import numpy as np
import pytest

from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.data.zarrlite import ZGroup


def test_docker_entry_generalized_env(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import yaml

    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline.engine import save_checkpoint
    from crimac_unet_tpu.pipeline import dockerscript

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=120,
                          seed=9)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ckpt = tmp_path / "model.msgpack"
    save_checkpoint(ckpt, variables)

    cfg = {"patch_size": [32, 32], "patch_overlap": 4, "preload_n_pings": 60,
           "depth": 2, "start_filts": 4, "fwd_batch": 8,
           "compute_dtype": "float32", "mesh_devices": 1,
           "save_labels": False}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setenv("MODELWEIGHTS", str(ckpt))
    monkeypatch.setenv("SURVEY_PATH", str(sv))
    monkeypatch.setenv("CONFIG_PATH", str(cfg_path))
    monkeypatch.setenv("OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("PRED_FILE", "pred_out.zarr")
    dockerscript.main()

    g = ZGroup.open(tmp_path / "pred_out.zarr")
    assert g["annotation"].shape == (2, 120, 60)
    assert (g["annotation"][:, :, :] > 0).any()


def test_multi_survey_batch_prediction(tmp_path):
    """BASELINE config 5: batch prediction over several surveys."""
    import jax
    import jax.numpy as jnp

    from crimac_unet_tpu.config import parse_config_options
    from crimac_unet_tpu.data.partition import make_partition
    from crimac_unet_tpu.models.unet import UNet, build_unet
    from crimac_unet_tpu.pipeline.inference import GriddedRunner
    from crimac_unet_tpu.pipeline.save_predict import run_save_predictions

    for year in (2016, 2017):
        make_zarr_survey(tmp_path, year=year, n_echograms=1, H=60, W=100,
                         seed=year, layout="nested")
    cfg = parse_config_options({
        "data_mode": "zarr", "path_to_zarr_files": str(tmp_path),
        "patch_size": [32, 32], "patch_overlap": 4, "preload_n_pings": 50,
        "depth": 2, "start_filts": 4, "fwd_batch": 8,
        "compute_dtype": "float32", "mesh_devices": 1,
        "partition_predict": "selected surveys",
        "save_prediction_surveys": [2016, 2017], "save_labels": False,
        "yaml_path": tmp_path / "x.yaml"})
    model = build_unet(cfg)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    runner = GriddedRunner(model, variables, cfg)
    out_dir = tmp_path / "preds"
    os.makedirs(out_dir)
    run_save_predictions(cfg, runner, make_partition(cfg), str(out_dir))
    stores = sorted(p.name for p in out_dir.glob("*_pred.zarr"))
    assert stores == ["S2016843_pred.zarr", "S2017843_pred.zarr"]


def test_docker_entry_no_implicit_save_labels(tmp_path, monkeypatch):
    """The container output contract is predictions-only (reference
    dockerscript writes no labels): the schema-level save_labels default
    of True must not apply unless the mounted YAML sets the key
    explicitly (review finding)."""
    import jax
    import jax.numpy as jnp
    import yaml

    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline.engine import save_checkpoint
    from crimac_unet_tpu.pipeline import dockerscript

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=120,
                          seed=9)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 4), jnp.float32),
                           train=False)
    ckpt = tmp_path / "model.msgpack"
    save_checkpoint(ckpt, variables)

    base = {"patch_size": [32, 32], "patch_overlap": 4,
            "preload_n_pings": 60, "depth": 2, "start_filts": 4,
            "fwd_batch": 8, "compute_dtype": "float32", "mesh_devices": 1}

    monkeypatch.setenv("MODELWEIGHTS", str(ckpt))
    monkeypatch.setenv("SURVEY_PATH", str(sv))
    monkeypatch.setenv("OUTPUT_DIR", str(tmp_path))

    # no save_labels key in the YAML -> predictions only
    (tmp_path / "c1.yaml").write_text(yaml.safe_dump(base))
    monkeypatch.setenv("CONFIG_PATH", str(tmp_path / "c1.yaml"))
    monkeypatch.setenv("PRED_FILE", "implicit.zarr")
    dockerscript.main()
    g = ZGroup.open(tmp_path / "implicit.zarr")
    assert "labels" not in g

    # explicit save_labels: true -> honored
    (tmp_path / "c2.yaml").write_text(
        yaml.safe_dump(dict(base, save_labels=True)))
    monkeypatch.setenv("CONFIG_PATH", str(tmp_path / "c2.yaml"))
    monkeypatch.setenv("PRED_FILE", "explicit.zarr")
    dockerscript.main()
    g2 = ZGroup.open(tmp_path / "explicit.zarr")
    assert "labels" in g2


def test_run_save_predictions_warns_on_empty_survey_list(tmp_path, capsys):
    from crimac_unet_tpu.pipeline.save_predict import run_save_predictions
    run_save_predictions({"save_prediction_surveys": []}, None, None,
                         str(tmp_path))
    out = capsys.readouterr().out
    assert "save_prediction_surveys is empty" in out
