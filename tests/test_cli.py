"""CLI entry points driven as subprocesses (the real user surface)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from crimac_unet_tpu.data.fixtures import make_survey_dir, make_zarr_survey

REPO = Path(__file__).resolve().parent.parent


def _run(module, args, cwd, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["CRIMAC_JAX_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, "-m", module] + args, cwd=str(cwd), env=env,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, \
        f"{module} failed:\nSTDOUT:{proc.stdout[-3000:]}\n" \
        f"STDERR:{proc.stderr[-3000:]}"
    return proc


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cli")
    memm = wd / "echograms"
    make_survey_dir(memm, year=2017, n_echograms=2, H=80, W=150, seed=6)
    zarr_root = wd / "zarr"
    make_zarr_survey(zarr_root, year=2017, n_echograms=2, H=80, W=150,
                     seed=6, layout="nested")
    (wd / "setpyenv.json").write_text(json.dumps({
        "path_to_echograms": str(memm),
        "path_to_zarr_files": str(zarr_root) + "/",
    }))
    cfg = {
        "random_seed": 3, "frequencies": [18, 38, 120, 200],
        "data_mode": "memm", "num_workers": 2, "patch_size": [32, 32],
        "meta_channels": [], "late_meta_inject": False, "loss_type": "CE",
        "batch_size": 2, "lr": 0.005, "lr_reduction": 0.5, "momentum": 0.95,
        "test_iter": 1, "log_step": 2, "lr_step": 2, "iterations": 3,
        "partition_train": "selected surveys", "train_surveys": [2017],
        "validation_surveys": [2017], "save_model_params": True,
        "eval_mode": "all", "partition_predict": "selected surveys",
        "evaluation_surveys": [2017], "labels_available": True,
        "patch_overlap": 4, "preload_n_pings": 60,
        "save_prediction_surveys": [2017], "resume_writing": False,
        "save_labels": True, "depth": 2, "start_filts": 4,
        "compute_dtype": "float32", "train_dtype": "float32",
        "fwd_batch": 8, "mesh_devices": 1,
    }
    (wd / "config_test.yaml").write_text(yaml.safe_dump(cfg))
    return wd


def test_cli_train_evaluate_save_predict(workdir):
    wd = workdir
    _run("crimac_unet_tpu.pipeline.train",
         ["--yaml_path", "config_test.yaml"], cwd=wd)
    runs = sorted((wd / "saved_models" / "config_test").iterdir())
    assert runs, "no checkpoint dir created"
    ckpt = runs[-1] / "best.msgpack"
    assert ckpt.exists()

    # --save_path_* resolve with strict=True (reference CLI contract):
    # the directories must pre-exist
    (wd / "metrics").mkdir(exist_ok=True)
    (wd / "plots").mkdir(exist_ok=True)
    _run("crimac_unet_tpu.pipeline.evaluate",
         ["--yaml_path", "config_test.yaml",
          "--checkpoint_path", str(ckpt),
          "--save_path_metrics", str(wd / "metrics"),
          "--save_path_plot", str(wd / "plots")], cwd=wd)
    csvs = list((wd / "metrics").rglob("2017_test.csv"))
    pngs = list((wd / "plots").rglob("2017_pr.png"))
    assert csvs and pngs

    # school-level detection eval reuses the eval flag set and the same
    # trained checkpoint (pipeline/school_eval.py)
    _run("crimac_unet_tpu.pipeline.school_eval",
         ["--yaml_path", "config_test.yaml",
          "--checkpoint_path", str(ckpt),
          "--save_path_metrics", str(wd / "metrics"),
          "--save_path_plot", str(wd / "plots")], cwd=wd)
    school_csvs = list((wd / "metrics").rglob("2017_school_eval.csv"))
    assert school_csvs
    import pandas as pd
    df = pd.read_csv(school_csvs[0])
    assert "AP" in df.columns and len(df) >= 2

    (wd / "preds").mkdir(exist_ok=True)
    _run("crimac_unet_tpu.pipeline.save_predict",
         ["--yaml_path", "config_test.yaml",
          "--checkpoint_path", str(ckpt),
          "--save_predictions_path", str(wd / "preds"),
          "--data_mode", "zarr"], cwd=wd)
    stores = list((wd / "preds").glob("*_pred.zarr"))
    assert stores
    from crimac_unet_tpu.data.zarrlite import ZGroup
    g = ZGroup.open(stores[0])
    assert g["annotation"].shape[0] == 2
    assert "labels" in g  # save_labels: True
    assert g["labels"].shape == g["annotation"].shape[1:]


def test_selfcheck_cli(tmp_path):
    """Deployment smoke tool: host-only mode must pass on this box and
    report every required line."""
    proc = _run("crimac_unet_tpu.selfcheck", ["--skip-device"],
                cwd=tmp_path)
    out = proc.stdout
    assert "SELFCHECK PASSED" in out
    for name in ("blosc backend", "zarr store", "zarr reopen",
                 "end-to-end predict"):
        assert name in out, out
    assert "[FAIL]" not in out


def test_output_paths_may_not_exist_yet(tmp_path):
    """Output-path CLI args resolve non-strict; the entry points
    makedirs them (a fresh output root used to die inside argparse with
    a raw FileNotFoundError — review finding)."""
    from crimac_unet_tpu.config import get_argparse_parser
    p = get_argparse_parser("eval")
    args = p.parse_args(["--yaml_path", __file__,
                         "--checkpoint_path", __file__,
                         "--save_path_metrics", str(tmp_path / "m" / "x"),
                         "--save_path_plot", str(tmp_path / "p" / "y")])
    assert str(args.save_path_metrics).endswith("x")
    p2 = get_argparse_parser("save_predict")
    args2 = p2.parse_args(["--yaml_path", __file__,
                           "--checkpoint_path", __file__,
                           "--save_predictions_path",
                           str(tmp_path / "fresh_preds")])
    assert str(args2.save_predictions_path).endswith("fresh_preds")


def test_validation_pool_falls_back_even_when_forced(capsys):
    """A forced train pool that fits must not be killed by a validation
    pool that exceeds the REMAINING budget — role='validation' falls
    back to host crops with an accurate message (review finding)."""
    from crimac_unet_tpu.pipeline.train import maybe_build_pool

    class FatReader:
        data_format = "memmap"
        shape = (4000, 200000)  # ~3 GB/freq at f32

        def get_seabed(self, *a, **k):
            raise AssertionError("pool should not be built")

    cfg = {"use_device_pool": True, "device_pool_budget_mb": 100,
           "patch_size": [256, 256], "frequencies": [18, 38, 120, 200]}
    got = maybe_build_pool(cfg, [FatReader()], budget_mb=10,
                           role="validation")
    assert got is None
    out = capsys.readouterr().out
    assert "validation" in out and "host crops" in out
    # the train role still raises loudly in forced mode
    import pytest as _pytest
    with _pytest.raises(ValueError, match="device_pool_budget_mb"):
        maybe_build_pool(cfg, [FatReader()], budget_mb=10, role="train")
