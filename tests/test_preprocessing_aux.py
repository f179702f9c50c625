"""Aux/preprocessing components: regrid, rechunk, interp, korona,
mat->memmap, Gridded sampler, plotting."""

import json
import os

import numpy as np
import pytest

from crimac_unet_tpu.data.fixtures import make_survey_dir
from crimac_unet_tpu.data.memmap_reader import Echogram, get_echograms


@pytest.fixture(scope="module")
def ech(tmp_path_factory):
    path = tmp_path_factory.mktemp("aux")
    make_survey_dir(path, year=2014, n_echograms=1, H=80, W=160, seed=13)
    return get_echograms(years=[2014], path_to_echograms=str(path),
                         minimum_shape=60)[0]


# ----------------------------------------------------------------- regrid
def test_area_weighted_regrid_identity_and_mass():
    from crimac_unet_tpu.data.regrid import (area_weighted_regrid_1d,
                                             regrid_data, sanity_check)
    rng = np.random.RandomState(0)
    data = rng.rand(40, 30)
    src = np.arange(40, dtype=float)
    # identity grid
    np.testing.assert_allclose(
        area_weighted_regrid_1d(data, src, src, axis=0), data, atol=1e-12)
    # 2x coarsening = pairwise means
    dst = src[::2] + 0.5
    out = area_weighted_regrid_1d(data, src, dst, axis=0)
    np.testing.assert_allclose(out, (data[::2] + data[1::2]) / 2, atol=1e-9)
    # nan exclusion
    data2 = data.copy()
    data2[0, 0] = np.nan
    out2 = area_weighted_regrid_1d(data2, src, dst, axis=0)
    np.testing.assert_allclose(out2[0, 0], data[1, 0], atol=1e-9)
    # full 2-D regrid conserves mass
    tsrc = np.arange(30, dtype=float)
    out3 = regrid_data(data, src, tsrc, dst, tsrc[::3] + 1.0)
    assert sanity_check(data, out3, rel_tol=0.2)


def test_regrid_prediction_roundtrip(ech):
    from crimac_unet_tpu.data.regrid import regrid_prediction
    pred = np.random.RandomState(1).rand(*ech.shape)
    out = regrid_prediction(pred, ech)  # same grid -> identity (nearest)
    np.testing.assert_allclose(out, pred)


def test_fix_pings_and_regrid(ech):
    from crimac_unet_tpu.data.regrid import fix_pings_and_regrid
    data, labels, new_range, new_time = fix_pings_and_regrid(
        ech, ping_rate=1.0, range_diff=None)
    assert data.shape[0] == len(new_range)
    assert data.shape[1] == len(new_time)
    assert data.shape[2] == 4
    assert labels.shape == data.shape[:2]


# ----------------------------------------------------------------- interp
def test_interp_matches_reference_semantics():
    from crimac_unet_tpu.utils.interp import (get_grid, linear_interpolation,
                                              nearest_interpolation)
    g = get_grid([4, 6])
    assert g.shape == (2, 4, 6)
    assert g[0].min() == -1 and g[0].max() == 2  # -((N+1)//2)+1 .. N//2

    arr = np.arange(20, dtype=float).reshape(4, 5)
    inds = np.stack(np.meshgrid(np.arange(4), np.arange(5), indexing="ij"))
    np.testing.assert_array_equal(
        nearest_interpolation(arr, inds, out_shape=(4, 5)), arr)
    np.testing.assert_allclose(
        linear_interpolation(arr, inds, out_shape=(4, 5)), arr)
    # fractional point
    val = linear_interpolation(arr, np.array([[1.5], [2.5]]))
    assert abs(val[0] - (arr[1, 2] + arr[1, 3] + arr[2, 2] + arr[2, 3]) / 4) \
        < 1e-9
    # out of range -> boundary val
    val = nearest_interpolation(arr, np.array([[-3.0], [0.0]]),
                                boundary_val=-7)
    assert val[0] == -7


# ---------------------------------------------------------------- rechunk
def test_rechunk_store(tmp_path, ech):
    from crimac_unet_tpu.data.preprocess import echograms_to_zarr_survey
    from crimac_unet_tpu.data.rechunk import rechunk_store
    from crimac_unet_tpu.data.zarrlite import ZGroup
    echograms_to_zarr_survey([ech], tmp_path, "S2014843")
    src = tmp_path / "S2014843_sv.zarr"
    dst = tmp_path / "S2014843_sv_rechunked.zarr"
    rechunk_store(src, dst, {"frequency": 1, "ping_time": 37, "range": 80})
    a, b = ZGroup.open(src), ZGroup.open(dst)
    assert b["sv"].chunks == (1, 37, 80)
    np.testing.assert_array_equal(a["sv"][:, :, :], b["sv"][:, :, :])
    np.testing.assert_array_equal(a["ping_time"][:], b["ping_time"][:])
    # both the converter and the rechunker (reference rechunk_zarr.py:51)
    # leave consolidated metadata on their outputs
    import json
    for store in (src, dst):
        doc = json.loads((store / ".zmetadata").read_text())
        assert doc["zarr_consolidated_format"] == 1
        assert doc["metadata"]["sv/.zarray"] == json.loads(
            (store / "sv" / ".zarray").read_text())


# ----------------------------------------------------------------- korona
def test_korona_labels(ech, tmp_path):
    from crimac_unet_tpu.data.korona import (get_korona_labels,
                                             get_korona_list_from_json)
    from crimac_unet_tpu.data.memmap_reader import _matlab_time_to_datetime
    t0 = _matlab_time_to_datetime(float(ech.time_vector[5]))
    korona = [{
        "time": t0.isoformat() + "Z",
        "pingNumber": 5,
        "depthRanges": [{"min": float(ech.range_vector[10]) + 1.0,
                         "max": float(ech.range_vector[30]) + 1.0}],
    }]
    path = tmp_path / "korona.json"
    path.write_text(json.dumps(korona))
    klist = get_korona_list_from_json(path)
    depths = np.zeros((ech.shape[1], 1))
    labels = get_korona_labels(ech, klist, transducer_depths=depths)
    assert labels.shape == ech.shape
    assert labels.sum() > 0
    cols = np.unique(np.argwhere(labels > 0)[:, 1])
    assert len(cols) == 1  # one ping annotated


# ----------------------------------------------------------- mat -> memmap
def test_mat_to_memmap_roundtrip(tmp_path):
    import scipy.io as spio
    from crimac_unet_tpu.data.mat_to_memmap import convert_mat_file
    rng = np.random.RandomState(2)
    H, W, C = 40, 60, 4
    sv = rng.lognormal(np.log(1e-7), 1.0, (H, W, C)).astype(np.float64)
    I = np.zeros((H, W))
    I[10:14, 20:30] = 27
    mat = {"sv": sv, "I": I, "F": np.array([[18., 38., 120., 200.]]),
           "range": np.arange(H, dtype=float) * 0.18,
           "t": 736000.0 + np.arange(W) / 86400.0,
           "depths": np.zeros((W, 1)), "heave": np.zeros((1, W))}
    spio.savemat(tmp_path / "2014843-D20140427-T000000.mat", mat)
    n_obj = convert_mat_file(tmp_path / "2014843-D20140427-T000000.mat",
                             tmp_path / "2014843-D20140427-T000000")
    assert n_obj == 1
    e = Echogram(tmp_path / "2014843-D20140427-T000000")
    assert e.shape == (H, W)
    np.testing.assert_allclose(np.asarray(e.data_memmaps(38)[0]),
                               sv[:, :, 1].astype(np.float32))
    assert e.objects[0]["fish_type_index"] == 27


# ------------------------------------------------------- gridded + plotting
def test_gridded_sampler(ech):
    from crimac_unet_tpu.data.samplers import Gridded
    g = Gridded([ech], [32, 32], patch_overlap=4, mode="all")
    assert len(g) > 0
    center, reader = g.get_sample(0)
    assert reader is ech
    assert len(center) == 2
    g2 = Gridded([ech], [32, 32], patch_overlap=4, mode="region")
    assert len(g2) > 0


def test_visualize_smoke(ech, tmp_path):
    out = tmp_path / "ech.png"
    fig = ech.visualize(n_pings=100, predictions=np.zeros((2,) + ech.shape),
                        save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_visualize_predictions_vs_labels(tmp_path, rng):
    """Prediction-vs-label comparison panels over a written pred store
    (reference data_reader.py:895-1009 prediction overlays)."""
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.data.zarrlite import ZGroup
    from crimac_unet_tpu.utils.plotting import visualize_predictions_vs_labels

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=120,
                          seed=8)
    reader = DataReaderZarr(sv)
    g = ZGroup.create(tmp_path / "pred.zarr")
    probs = rng.rand(2, 120, 60).astype(np.float16)
    g.create_array("annotation", probs.shape, (1, 60, 60), np.float16,
                   fill_value=0, compressor="blosc-zstd",
                   dims=["category", "ping_time", "range"])[:] = probs

    out = tmp_path / "cmp.png"
    fig = visualize_predictions_vs_labels(reader, tmp_path / "pred.zarr",
                                          save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_sparse_overlap_weights_match_dense():
    """The banded searchsorted weight construction (bounded memory at
    survey scale) is numerically identical to the dense overlap matrix."""
    from crimac_unet_tpu.data.regrid import (_overlap_matrix,
                                             _overlap_weights)
    rng = np.random.RandomState(3)
    for _ in range(5):
        src = np.cumsum(0.1 + rng.rand(rng.randint(5, 60)))
        dst = np.cumsum(0.05 + rng.rand(rng.randint(4, 80)) * 1.7)
        dense = _overlap_matrix(src, dst)
        sparse = _overlap_weights(src, dst).toarray()
        np.testing.assert_allclose(sparse, dense, atol=1e-12)


def test_nearest_regrid_sparse_matches_dense_argmin():
    """nearest_regrid_1d is O(n log n)/O(n) (the dense distance matrix
    was ~20 GB at survey scale — review finding r3) and must match the
    dense argmin exactly on sorted-unique grids (the real usage), and be
    distance-optimal always."""
    from crimac_unet_tpu.data.regrid import nearest_regrid_1d
    rng = np.random.RandomState(3)
    for trial in range(60):
        src = np.unique(rng.choice(np.arange(200), rng.randint(2, 50)))
        dst = rng.uniform(-10, 210, rng.randint(1, 50))
        dst[0] = (src[0] + src[1]) / 2  # exact midpoint tie
        data = np.arange(src.size, dtype=float)[:, None] * [1.0, 1.0]
        got = nearest_regrid_1d(data, src, dst, axis=0)[:, 0].astype(int)
        want = np.abs(dst[:, None] - src[None, :]).argmin(axis=1)
        np.testing.assert_array_equal(got, want, err_msg=str(trial))


def test_regrid_prediction_drops_matching_pred_columns():
    """A backwards time step drops the ping AND its prediction column;
    the old code deleted only the time entry, shifting every later
    prediction by one ping (review finding r3)."""
    from crimac_unet_tpu.data.regrid import regrid_prediction

    class FakeEch:
        time_vector = np.array([0.0, 1.0, 2.0, 1.5, 3.0, 4.0])
        range_vector = np.arange(5, dtype=float)

    pred = np.arange(5 * 6, dtype=float).reshape(5, 6)
    out = regrid_prediction(pred, FakeEch())
    # dropped ping 3 (backwards step): the output lives on the cleaned
    # 5-ping grid and must carry pred columns [0,1,2,4,5] — the old code
    # kept all 6 pred columns, shifting everything after the drop by one
    assert out.shape == (5, 5)
    np.testing.assert_array_equal(out, pred[:, [0, 1, 2, 4, 5]])


def test_single_frequency_mat_converts(tmp_path):
    """A one-channel .mat (F saved as (1,1)) converts instead of dying
    on 0-d iteration (review finding r3)."""
    import scipy.io as spio

    from crimac_unet_tpu.data.mat_to_memmap import convert_mat_file

    H, W = 20, 30
    mat = {"F": np.array([[200.0]]),
           "sv": np.random.RandomState(0).rand(H, W, 1),
           "I": np.zeros((H, W)),
           "range": np.arange(H, dtype=float)[:, None],
           "t": (736000.0 + np.arange(W) / 86400.0)[None, :],
           "heave": np.zeros((1, W)),
           "depths": np.full((W, 1), 50.0)}
    spio.savemat(tmp_path / "f.mat", mat)
    n = convert_mat_file(str(tmp_path / "f.mat"), str(tmp_path / "out"))
    assert n == 0
    assert (tmp_path / "out" / "data_for_freq_200.dat").is_file()


def test_convert_survey_tree_flat_layout(tmp_path):
    """convert_survey_tree consumes .mat files written flat into the
    scratch dir (the convert_survey_raw chain — review finding r3: the
    documented chain silently produced nothing)."""
    import scipy.io as spio

    from crimac_unet_tpu.data.mat_to_memmap import convert_survey_tree

    H, W = 16, 24
    mat = {"F": np.array([[38.0, 200.0]]),
           "sv": np.random.RandomState(1).rand(H, W, 2),
           "I": np.zeros((H, W)),
           "range": np.arange(H, dtype=float)[:, None],
           "t": (736000.0 + np.arange(W) / 86400.0)[None, :],
           "heave": np.zeros((1, W)),
           "depths": np.full((W, 1), 50.0)}
    spio.savemat(tmp_path / "2019843-D1-T1.mat", mat)
    converted = convert_survey_tree(str(tmp_path))
    assert converted == ["2019843-D1-T1"]
    assert (tmp_path / "memmap" / "2019843-D1-T1" / "labels.dat").is_file()


def test_rechunk_store_copies_vlen_arrays(tmp_path):
    """Production real-xarray stores hold vlen-utf8 string coordinates;
    rechunk must carry them over verbatim, not crash on object dtype."""
    from test_zarrlite import _write_vlen_utf8_array

    from crimac_unet_tpu.data.rechunk import rechunk_store
    from crimac_unet_tpu.data.zarrlite import (ZGroup,
                                               default_blosc_compressor)
    src = tmp_path / "src.zarr"
    g = ZGroup.create(src)
    g.create_array("sv", (1, 10, 6), (1, 4, 6), np.float32,
                   fill_value=np.nan,
                   dims=["frequency", "ping_time", "range"])[:, :, :] = \
        np.arange(60, dtype=np.float32).reshape(1, 10, 6)
    names = [f"f{i}.raw" for i in range(10)]
    _write_vlen_utf8_array(str(src / "raw_file"), names, chunks=4,
                           compressor=default_blosc_compressor())
    dst = tmp_path / "dst.zarr"
    rechunk_store(src, dst, {"frequency": 1, "ping_time": 5, "range": 6})
    out = ZGroup.open(dst)
    assert out["sv"].chunks == (1, 5, 6)
    np.testing.assert_array_equal(out["sv"][:], g["sv"][:])
    assert list(out["raw_file"][:]) == names
    assert out["raw_file"].chunks == (4,)  # copied verbatim


def test_regrid_handles_multi_ping_backward_jump():
    """A multi-ping backward clock jump must still yield a monotonic
    axis (the reference's one-pass drop left it non-monotonic, silently
    forcing the ~20 GB dense overlap fallback — review finding)."""
    from crimac_unet_tpu.data.regrid import _monotonic_keep
    t = np.array([0.0, 1.0, 2.0, 10.0, 3.0, 4.0, 11.0, 12.0])
    keep = _monotonic_keep(t)
    kept = t[keep]
    assert np.all(np.diff(kept) >= 0)
    # the single-dip case matches the reference's one-pass drop exactly
    t2 = np.array([0.0, 1.0, 0.5, 2.0])
    np.testing.assert_array_equal(_monotonic_keep(t2), [0, 1, 3])


def test_regrid_degenerate_single_cell_targets(ech):
    """An echogram shorter than one target step keeps the original axis
    instead of crashing in _edges (review finding)."""
    from crimac_unet_tpu.data.regrid import _edges, fix_pings_and_regrid
    with pytest.raises(ValueError, match=">= 2 cell centers"):
        _edges(np.array([5.0]))
    # huge ping step -> new_time would be a single sample
    data, labels, new_range, new_time = fix_pings_and_regrid(
        ech, ping_rate=1e-9, range_diff=None)
    assert len(new_time) >= 2
    assert data.shape[1] == len(new_time)


def test_convert_single_frequency_matlab_mat(tmp_path):
    """MATLAB drops trailing singleton dims: a single-frequency .mat
    arrives with 2-D sv and must convert (review finding)."""
    import scipy.io as spio
    from crimac_unet_tpu.data.mat_to_memmap import convert_mat_file
    rng = np.random.RandomState(3)
    H, W = 30, 40
    mat = {"sv": rng.lognormal(np.log(1e-7), 1.0, (H, W)),
           "I": np.zeros((H, W)),
           "F": np.array([[38.0]]),
           "range": np.arange(H, dtype=float) * 0.18,
           "t": 736000.0 + np.arange(W) / 86400.0,
           "depths": np.zeros((W, 1)), "heave": np.zeros((1, W))}
    spio.savemat(tmp_path / "2014843-D20140427-T000001.mat", mat)
    convert_mat_file(tmp_path / "2014843-D20140427-T000001.mat",
                     tmp_path / "2014843-D20140427-T000001")
    e = Echogram(tmp_path / "2014843-D20140427-T000001")
    assert e.shape == (H, W)
    np.testing.assert_allclose(np.asarray(e.data_memmaps(38)[0]),
                               mat["sv"].astype(np.float32))
