"""Cruise-series catalog / pairing / staging (the generate_metadata.m
chain) against a synthetic IMR-style cruise-data tree."""

import json
import os

import numpy as np
import pytest

from crimac_unet_tpu.data import cruise_catalog as cc


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Synthetic data disk: one series, two years; one cruise with files at
    standard + non-standard locations, one cruise dir missing entirely."""
    root = tmp_path_factory.mktemp("cruise_data")
    c1 = root / "S2011_PGOS" / "2011"
    raw = c1 / cc.STD_RAW_DIR
    snap = c1 / cc.STD_SNAP_DIR
    work = c1 / cc.STD_WORK_DIR
    for d in (raw, snap, work):
        d.mkdir(parents=True)
    # three paired stems; stem "c" lacks a snap, stem "d" lacks a raw
    for stem in ("a", "b", "c"):
        (raw / f"{stem}.raw").write_bytes(b"RAW" + stem.encode())
    (raw / "a.bot").write_bytes(b"BOTa")  # bot next to the raw
    for stem in ("a", "b", "d"):
        (snap / f"{stem}.snap").write_bytes(b"SNAP" + stem.encode())
    (work / "a.work").write_bytes(b"WORKa")
    # a raw file outside the standard location
    stray = c1 / "EXTRA"
    stray.mkdir()
    (stray / "z.raw").write_bytes(b"RAWz")

    series = {
        "name": "sandeel",
        "sampletime": [
            {"sampletime": "2011",
             "Cruise": [{"cruisenr": "2011843", "shipName": "G.O. Sars",
                         "datapath": "S2011_PGOS/2011"}]},
            {"sampletime": "2012",
             "Cruise": [{"cruisenr": "2012830", "shipName": "Johan Hjort",
                         "datapath": "S2012_MISSING/2012"}]},
        ],
    }
    sj = root / "series.json"
    sj.write_text(json.dumps([series]))
    return root, series, sj


def test_load_cruise_series(tree):
    root, series, sj = tree
    loaded = cc.load_cruise_series(sj)
    assert loaded == [series]
    with pytest.raises(ValueError):
        bad = root / "bad.json"
        bad.write_text(json.dumps({"name": "not-a-list"}))
        cc.load_cruise_series(bad)


def test_scan_counts_std_vs_nonstd(tree):
    root, series, _ = tree
    filecount, files = cc.scan_cruise_files(root / "S2011_PGOS" / "2011")
    # (raw, snap, work std; raw, snap, work non-std)
    # generate_metadata.m:120-123 column layout
    assert filecount == [3, 3, 1, 1, 0, 0]
    assert len(files[".raw"]) == 4 and files[".raw"][-1].endswith("z.raw")


def test_subdir_of_std_location_counts_nonstd(tmp_path):
    """Only the exact convention directory is 'standard'; backup/ copies
    below it count as NotStdLocation."""
    d = tmp_path / "C"
    (d / cc.STD_RAW_DIR).mkdir(parents=True)
    (d / cc.STD_RAW_DIR / "a.raw").write_bytes(b"r")
    (d / cc.STD_RAW_DIR / "backup").mkdir()
    (d / cc.STD_RAW_DIR / "backup" / "old.raw").write_bytes(b"r")
    filecount, _ = cc.scan_cruise_files(d)
    assert filecount == [1, 0, 0, 1, 0, 0]


def test_stage_accepts_precomputed_overview(tree, tmp_path):
    root, series, _ = tree
    overview = cc.build_data_overview(series, root)
    created = cc.stage_paired_files(series, root, tmp_path,
                                    overview=overview)
    assert len(created) == 5


def test_pairing_by_stem(tree):
    root, *_ = tree
    _, files = cc.scan_cruise_files(root / "S2011_PGOS" / "2011")
    pairs = cc.pair_files(files)
    by_stem = {os.path.splitext(os.path.basename(p[2] or p[0]))[0]: p
               for p in pairs}
    assert set(by_stem) == {"a", "b", "c", "d", "z"}
    snap, work, raw = by_stem["a"]
    assert snap.endswith("a.snap") and work.endswith("a.work") \
        and raw.endswith("a.raw")
    assert by_stem["c"][0] == "" and by_stem["c"][2].endswith("c.raw")
    assert by_stem["d"][2] == "" and by_stem["d"][0].endswith("d.snap")
    assert by_stem["z"] == ("", "", str(root / "S2011_PGOS/2011/EXTRA/z.raw"))


def test_overview_rows_and_missing_dir_nan(tree):
    root, series, _ = tree
    rows, paired = cc.build_data_overview(series, root)
    assert rows[0][:2] == ["CruiseSeries", "Year"]
    assert len(rows) == 3 and len(paired) == 2
    assert rows[1][:4] == ["sandeel", "2011", "2011843", "G.O. Sars"]
    assert rows[1][6:] == [3, 3, 1, 1, 0, 0]
    # missing cruise dir -> NaN counts, no pairs (generate_metadata.m:154-161)
    assert all(v != v for v in rows[2][6:])
    assert paired[1] == []


def test_save_overview_mat_csv_roundtrip(tree, tmp_path):
    from scipy.io import loadmat
    root, series, _ = tree
    out = cc.save_overview(series, root, tmp_path)
    m = loadmat(out["overview_mat"])
    ds = m["DataStatus"]
    assert ds.shape == (3, 12)
    assert str(ds[0, 0][0]) == "CruiseSeries"
    assert str(ds[1, 3][0]) == "G.O. Sars"
    p = loadmat(out["paired_mat"])["pairedfiles"]
    # each entry is a struct with field F (the pair cell table), the
    # layout generate_metadata2.m:42 consumes (dat.pairedfiles{i}.F)
    f0 = p[0, 0]["F"][0, 0]
    assert f0.shape == (5, 3)
    csv = open(out["csv"]).read().splitlines()
    assert csv[0].startswith("CruiseSeries;Year;")
    assert ";3;3;1;1;0;0;" in csv[1]
    # NaN counts render as empty fields in the csv
    assert csv[2].endswith(";;;;;;;")


def test_stage_paired_files(tree, tmp_path):
    root, series, _ = tree
    created = cc.stage_paired_files(series, root, tmp_path)
    dest = tmp_path / "data" / "sandeel" / "2011"
    # only fully-paired (snap AND raw) stems staged: a and b; a has a .bot
    names = sorted(os.path.basename(c) for c in created)
    assert names == ["a.bot", "a.raw", "a.snap", "b.raw", "b.snap"]
    assert (dest / "a.bot").read_bytes() == b"BOTa"
    assert (dest / "b.raw").read_bytes() == b"RAWb"
    # idempotent re-run copies nothing new without overwrite
    assert cc.stage_paired_files(series, root, tmp_path) == []
