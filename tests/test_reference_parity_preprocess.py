"""Parity for the reference's offline preprocessing chain, executed live.

Two reference code paths that previous rounds matched only against
builder-written oracles now run for real in the parity subprocess:

* the lazy cache generators — ``labels_heave.dat`` via
  write_label_file_without_heave_correction_one_echogram
  (generate_heave_compensation_files.py:31-63) and ``seabed.npy`` via the
  gradient-filter estimator (data_reader.py:433-507) — on pristine
  echogram dirs (the memm parity fixture pre-seeds those caches with OUR
  code; this module proves the two generators agree byte-for-byte, which
  is what makes that pre-seeding sound);
* the memmap -> zarr survey converter
  (data_preprocessing/memmap_to_zarr.py:127-171), writing the survey
  triplet through xrlite's ``to_zarr``, diffed against our
  ``echograms_to_zarr_survey`` value-for-value.

Known dtype divergences (ours deliberate, see DIVERGENCES.md): the
reference converter writes sv/bottom as float64 (``np.full(...).astype
(float)``, memmap_to_zarr.py:41,103) and raw_file as unicode; we write
float32 (the dtype of production CRIMAC survey stores and of the source
memmaps — float64 doubles the store for no information) and |S64.
Values are asserted equal under cast.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from crimac_unet_tpu.data.fixtures import make_survey_dir
from crimac_unet_tpu.data.memmap_reader import Echogram
from crimac_unet_tpu.data.preprocess import echograms_to_zarr_survey
from crimac_unet_tpu.data.zarrlite import ZGroup

import ref_driver

pytestmark = pytest.mark.skipif(
    not ref_driver.reference_available(),
    reason="executed-parity harness needs /root/reference and torch")

REPO = Path(__file__).resolve().parent.parent
YEAR = 2017
# get_echograms' default minimum_shape=256 filter (data_reader.py:1166)
# must pass, so the converter fixture is larger than the pipeline ones
H, W = 280, 320


@pytest.fixture(scope="module")
def refpre(tmp_path_factory):
    root = tmp_path_factory.mktemp("refpreproc")
    ech_ours = root / "ech_ours"
    dirs = make_survey_dir(ech_ours, year=YEAR, n_echograms=2, H=H, W=W,
                           seed=47, n_schools=4, unused_species=True)
    assert all(not os.path.exists(os.path.join(d, f))
               for d in dirs for f in ("labels_heave.dat", "seabed.npy"))
    # pristine copy for the reference: each side generates its own caches
    ech_ref = root / "ech_ref"
    shutil.copytree(ech_ours, ech_ref)

    cfg = {
        "echograms_path": str(ech_ref), "work_dir": str(root / "work"),
        "out_dir": str(root / "out"), "ckpt": str(root / "dummy.pt"),
        "depth": 2, "start_filts": 8, "patch_size": [64, 64],
        "patch_overlap": 8, "batch_size": 4, "surveys": [],
        "eval_modes": [], "do_predict": False,
        "cache_gen": {"echogram_dirs":
                      sorted(str(ech_ref / os.path.basename(d))
                             for d in dirs)},
        "mat2zarr": {"out_dir": str(root / "ref_zarr_out"), "year": YEAR},
    }
    from parity_util import run_ref_driver
    run_ref_driver(cfg, root)
    return {"root": root, "ech_ours": ech_ours, "ech_ref": ech_ref,
            "dirs": [os.path.basename(d) for d in dirs]}


def test_cache_generation_parity(refpre):
    """labels_heave.dat and seabed.npy, generated independently by the
    reference's own code and by ours on identical pristine echograms,
    are byte-identical."""
    for name in refpre["dirs"]:
        ours_dir = refpre["ech_ours"] / name
        ref_dir = refpre["ech_ref"] / name
        ech = Echogram(str(ours_dir))
        ech.label_memmap(heave=True)          # generates labels_heave.dat
        ech.get_seabed(0, ech.shape[1])       # generates seabed.npy

        ours_lh = (ours_dir / "labels_heave.dat").read_bytes()
        ref_lh = (ref_dir / "labels_heave.dat").read_bytes()
        assert ours_lh == ref_lh, name

        np.testing.assert_array_equal(
            np.load(ours_dir / "seabed.npy"),
            np.load(ref_dir / "seabed.npy"), err_msg=name)


def test_memmap_to_zarr_converter_parity(refpre):
    """Our echograms_to_zarr_survey vs the reference's write_zarr_files
    on the same echograms: every array in the survey triplet is
    value-equal (under the documented float64->float32 / unicode->bytes
    dtype divergences)."""
    ref_gridded = (refpre["root"] / "ref_zarr_out" / str(YEAR) /
                   f"{YEAR}843" / "ACOUSTIC" / "GRIDDED")
    assert ref_gridded.is_dir(), list((refpre["root"] /
                                       "ref_zarr_out").rglob("*"))

    echs = [Echogram(str(refpre["ech_ours"] / n)) for n in refpre["dirs"]]
    cats = sorted({-1} | {int(t) for e in echs
                          for t in e.label_types_in_echogram})
    out_dir = refpre["root"] / "our_zarr_out"
    echograms_to_zarr_survey(echs, str(out_dir), f"{YEAR}843",
                             categories=cats)

    ref_sv = ZGroup.open(ref_gridded / f"{YEAR}843_sv.zarr")
    our_sv = ZGroup.open(out_dir / f"{YEAR}843_sv.zarr")
    np.testing.assert_array_equal(
        ref_sv["sv"][:].astype(np.float32), our_sv["sv"][:])
    np.testing.assert_array_equal(ref_sv["ping_time"][:],
                                  our_sv["ping_time"][:])
    np.testing.assert_array_equal(ref_sv["heave"][:], our_sv["heave"][:])
    np.testing.assert_array_equal(ref_sv["frequency"][:],
                                  our_sv["frequency"][:])
    np.testing.assert_array_equal(ref_sv["range"][:], our_sv["range"][:])
    np.testing.assert_array_equal(
        np.asarray(ref_sv["raw_file"][:], dtype="U64"),
        our_sv["raw_file"][:].astype("U64"))

    ref_lab = ZGroup.open(ref_gridded / f"{YEAR}843_labels.zarr")
    our_lab = ZGroup.open(out_dir / f"{YEAR}843_labels.zarr")
    ref_cats = ref_lab["category"][:]
    np.testing.assert_array_equal(ref_cats, our_lab["category"][:])
    np.testing.assert_array_equal(
        ref_lab["annotation"][:].astype(np.float32),
        our_lab["annotation"][:])

    ref_bot = ZGroup.open(ref_gridded / f"{YEAR}843_bottom.zarr")
    our_bot = ZGroup.open(out_dir / f"{YEAR}843_bottom.zarr")
    np.testing.assert_array_equal(
        ref_bot["bottom_range"][:].astype(np.float32),
        our_bot["bottom_range"][:])
    np.testing.assert_array_equal(ref_bot["ping_time"][:],
                                  our_bot["ping_time"][:])
