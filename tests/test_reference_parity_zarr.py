"""Parity against the ACTUAL reference *zarr* pipeline.

Round-3 closed the memmap-path parity gap by executing the reference
itself (tests/ref_driver.py); this module closes the zarr path, which was
previously non-executable here (xarray/zarr/dask absent).  ref_driver now
installs tests/xrlite.py — an eager mini-xarray backed by our zarrlite —
as ``xarray`` in the reference subprocess, so the reference's REAL
``DataReaderZarr`` (data_reader.py:510-893), ``get_crop_zarr``
(batch/dataset.py:358-407), gridded zarr evaluation (evaluate.py:39-79)
and ``save_survey_predictions_zarr`` (save_predict.py:137-219, incl. the
mode='w' → append_dim='ping_time' Blosc zstd-3 BITSHUFFLE writer and
resume_writing) execute unmodified on this repo's fixture stores.

Both sides read the same stores through DIFFERENT implementations
(xrlite+zarrlite in the subprocess vs data/zarr_reader.py here), so a
stub bug would surface as a diff, not a silent pass.

Tolerances: the reference's zarr crop path materializes float64 crops
(get_crop_zarr builds np.ones(...)*0 float64 arrays) so its dB transform
runs in float64 before torch's .float() cast, while its OWN memmap path
— and our pipeline — stay float32 throughout.  That reference-internal
inconsistency perturbs inputs at the f32-ulp level and flips many output
probabilities by 1-2 float16 ulp (measured max |dprob| 2.2e-3); write
masks, pixel selections, coordinates and class splits remain bit-exact.
See DIVERGENCES.md ("float64 zarr crops").
"""

import csv
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from crimac_unet_tpu.constants import SANDEEL
from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.data.zarrlite import ZGroup
from crimac_unet_tpu.models.torch_import import load_torch_checkpoint
from crimac_unet_tpu.models.unet import build_unet
from crimac_unet_tpu.ops import metrics
from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                evaluate_reader,
                                                save_survey_predictions_zarr)

import ref_driver

pytestmark = pytest.mark.skipif(
    not ref_driver.reference_available(),
    reason="executed-parity harness needs /root/reference and torch")

REPO = Path(__file__).resolve().parent.parent
DEPTH, START_FILTS = 2, 8
PATCH, OVERLAP = [64, 64], 8
PROBES = [[0, 50, 0, 40], [37, 64, 11, 70], [180, 40, 0, 100]]
SEABED_PROBE = [3, 120]   # (idx_ping, n_pings) — shared with the driver
PRELOAD = 120


@pytest.fixture(scope="module")
def refzarr(tmp_path_factory):
    """Zarr fixture survey + one reference-pipeline subprocess run."""
    root = tmp_path_factory.mktemp("refzarrparity")
    fix = root / "zfix"
    sv = make_zarr_survey(fix, year=2017, n_echograms=2, H=100, W=200,
                          seed=31, n_schools=4, unused_species=True,
                          layout="nested")
    gridded = os.path.dirname(sv)
    survey_dir = os.path.dirname(os.path.dirname(gridded))

    # STOX transect CSV so get_valid_pings exercises time-index matching
    # on both sides (reference data_reader.py:577-598)
    pt = ZGroup.open(sv)["ping_time"][:]

    def iso(i):
        return np.datetime_as_string(pt[i], unit="s")

    stox = os.path.join(survey_dir, "STOX")
    os.makedirs(stox, exist_ok=True)
    with open(os.path.join(stox, "2017843_transects.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=["StartDateTime", "StopDateTime"])
        w.writeheader()
        w.writerow({"StartDateTime": iso(10), "StopDateTime": iso(150)})
        w.writerow({"StartDateTime": iso(230), "StopDateTime": iso(390)})

    # isolated symlink view for the reference: its get_objects_file caches
    # a derived _objects_parsed.csv next to the stores — both sides must
    # derive it independently, not read each other's cache
    rv_gridded = root / "refview" / "S2017843" / "ACOUSTIC" / "GRIDDED"
    rv_gridded.mkdir(parents=True)
    for entry in os.listdir(gridded):
        os.symlink(os.path.join(gridded, entry), rv_gridded / entry)
    os.symlink(stox, root / "refview" / "S2017843" / "STOX")

    out = root / "out"
    cfg = {
        "echograms_path": str(fix), "work_dir": str(root / "work"),
        "out_dir": str(out), "ckpt": str(root / "small.pt"),
        "depth": DEPTH, "start_filts": START_FILTS,
        "patch_size": PATCH, "patch_overlap": OVERLAP, "batch_size": 8,
        "surveys": [], "eval_modes": [], "do_predict": False,
        "zarr": {
            "sv_path": str(rv_gridded / "S2017843_sv.zarr"),
            "out_dir": str(out),
            "probes": PROBES,
            "seabed_probe": SEABED_PROBE,
            "eval_all": True,
            "predict": {
                "preload_n_pings": PRELOAD,
                "full_store": str(root / "ref_pred_full.zarr"),
                "resumed_store": str(root / "ref_pred_resumed.zarr")},
        },
    }
    from parity_util import run_ref_driver
    run_ref_driver(cfg, root)
    return {"root": root, "sv": sv, "out": out, "cfg": cfg}


def _our_runner(refzarr):
    variables = load_torch_checkpoint(refzarr["cfg"]["ckpt"])
    cfg = {"patch_size": PATCH, "patch_overlap": OVERLAP,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": DEPTH, "start_filts": START_FILTS,
           "transfer_dtype": "float32"}
    return GriddedRunner(build_unet(cfg), variables, cfg)


def test_zarr_reader_parity(refzarr):
    """Our DataReaderZarr vs the reference's, on the same stores: survey
    metadata, STOX valid-ping ranges, and data/label/seabed slices are
    all bit-exact."""
    out = refzarr["out"]
    reader = DataReaderZarr(refzarr["sv"])

    meta = json.load(open(out / "reader_meta.json"))
    assert meta["name"] == reader.name
    assert meta["year"] == reader.year
    assert tuple(meta["shape"]) == tuple(reader.shape)
    assert meta["fish_categories"] == \
        [int(c) for c in reader.fish_categories]
    assert meta["frequencies"] == [int(f) for f in reader.frequencies]

    np.testing.assert_array_equal(np.load(out / "valid_pings.npy"),
                                  np.asarray(reader.get_valid_pings()))

    for i, (p0, npi, r0, nr) in enumerate(PROBES):
        ref_d = np.load(out / f"data_slice_{i}.npy")
        our_d = np.asarray(reader.get_data_slice(
            p0, npi, idx_range=r0, n_range=nr,
            frequencies=[18, 38, 120, 200]))
        np.testing.assert_array_equal(ref_d, our_d)
        ref_l = np.load(out / f"label_slice_{i}.npy")
        our_l = np.asarray(reader.get_label_slice(
            p0, npi, idx_range=r0, n_range=nr)).astype(ref_l.dtype)
        np.testing.assert_array_equal(ref_l, our_l)

    np.testing.assert_array_equal(
        np.load(out / "seabed_mask.npy"),
        np.asarray(reader.get_seabed_mask(SEABED_PROBE[0], SEABED_PROBE[1],
                                          0, None, return_numpy=True)))
    np.testing.assert_array_equal(
        np.load(out / "seabed.npy"),
        np.asarray(reader.get_seabed(0, reader.shape[0])))


def test_zarr_fish_schools_parity(refzarr):
    """get_fish_schools: identical bounding boxes, categories, seabed
    distances and validity — each side derives its own
    _objects_parsed.csv from the raw objects CSV + bottom store."""
    import pandas as pd

    ref = pd.read_csv(refzarr["out"] / "fish_schools.csv", index_col=0)
    ours = DataReaderZarr(refzarr["sv"]).get_fish_schools()
    assert len(ref) == len(ours)
    for col in ["category", "upperdepthindex", "lowerdepthindex",
                "startpingindex", "endpingindex", "distance_to_seabed",
                "valid_object"]:
        np.testing.assert_array_equal(ref[col].to_numpy(),
                                      ours[col].to_numpy(), err_msg=col)


def test_zarr_predict_parity_vs_reference_pipeline(refzarr, tmp_path):
    """Our save_survey_predictions_zarr vs the reference's REAL zarr
    writer (save_predict.py:137-219) with the same weights: bit-identical
    write masks and store coordinates; probabilities within 1-2 f16 ulp
    (the reference's float64 zarr crops, see module docstring)."""
    runner = _our_runner(refzarr)
    reader = DataReaderZarr(refzarr["sv"])
    ours_store = tmp_path / "our_pred.zarr"
    save_survey_predictions_zarr(runner, reader, str(ours_store),
                                 preload_n_pings=PRELOAD)

    go = ZGroup.open(ours_store)
    gf = ZGroup.open(refzarr["root"] / "ref_pred_full.zarr")
    ours = go["annotation"][:].astype(np.float64)
    ref = gf["annotation"][:].astype(np.float64)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours != 0, ref != 0)
    diff = np.abs(ours - ref)
    assert diff.max() < 2.5e-3, diff.max()
    assert diff[ref != 0].mean() < 3e-4

    np.testing.assert_array_equal(go["ping_time"][:], gf["ping_time"][:])
    np.testing.assert_array_equal(go["category"][:], gf["category"][:])
    np.testing.assert_array_equal(go["range"][:], gf["range"][:])


def test_zarr_reference_resume_matches_single_run(refzarr):
    """The reference's resume_writing path (initialize_zarr_directory +
    append_dim, save_predict.py:107-134), interrupted after the first
    split and resumed, reproduces its own single-run store bit-for-bit —
    the contract our crash-consistent writer is held to."""
    gf = ZGroup.open(refzarr["root"] / "ref_pred_full.zarr")
    gr = ZGroup.open(refzarr["root"] / "ref_pred_resumed.zarr")
    for name in ("annotation", "ping_time", "category", "range"):
        np.testing.assert_array_equal(gf[name][:], gr[name][:],
                                      err_msg=name)


def test_zarr_eval_all_parity(refzarr):
    """Full-survey zarr evaluation (mode 'all') vs the reference's
    validate_model_survey_zarr computation: identical pixel selection
    and class split; best F1 / AP within the f16-ulp envelope of the
    reference's float64 zarr crops."""
    from sklearn.metrics import precision_recall_curve

    out = refzarr["out"]
    ref_labels = np.load(out / "zarr_eval_all_labels.npy")
    ref_preds = np.load(out / "zarr_eval_all_preds.npy")

    runner = _our_runner(refzarr)
    reader = DataReaderZarr(refzarr["sv"])
    hist = np.asarray(evaluate_reader(runner, reader,
                                      metrics.new_histogram(),
                                      eval_mode="all", chunk_cols=4))
    assert hist.sum() == len(ref_labels)
    assert hist[0].sum() == int((ref_labels == SANDEEL).sum())

    from parity_util import pr_f1_ap
    got = metrics.pr_curve_from_histogram(hist)
    ref_f1, ref_ap = pr_f1_ap(ref_labels, ref_preds, SANDEEL)
    assert abs(metrics.max_f1(got)[0] - ref_f1) < 1e-3
    ap_got = -np.sum(np.diff(got["recall"]) * got["precision"][:-1])
    assert abs(ap_got - ref_ap) < 1e-3


def test_zarr_region_trace_broken_in_reference(refzarr):
    """The reference CANNOT evaluate region/trace modes on zarr surveys:
    extend_label_masks calls echogram.get_object_bounding_boxes()
    (extend_label_masks.py:66), defined only on the memmap Echogram
    (data_reader.py:404).  Our framework supports it (school bboxes from
    the objects CSV) — documented divergence, DIVERGENCES.md."""
    crash = json.load(open(refzarr["out"] / "zarr_region_crash.json"))
    assert crash["crashed"] and crash["type"] == "AttributeError", crash
    assert "get_object_bounding_boxes" in crash["message"]

    runner = _our_runner(refzarr)
    reader = DataReaderZarr(refzarr["sv"])
    for mode in ("region", "trace"):
        hist = np.asarray(evaluate_reader(runner, reader,
                                          metrics.new_histogram(),
                                          eval_mode=mode, chunk_cols=4))
        assert hist.sum() > 0, mode
