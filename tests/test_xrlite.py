"""xrlite (the parity harness's mini-xarray) must match REAL xarray on
the semantics the reference touches — divergences here would make the
executed-parity evidence compare against a wrong xarray, not against
xarray. Each test pins a semantic a review found diverging."""

import numpy as np
import pytest

import xrlite


def test_argminmax_skip_nan_and_nat():
    # xarray defaults skipna=True: NaN/NaT must not win
    da = xrlite.DataArray(np.array([1.0, np.nan, 5.0]), dims=("r",))
    assert int(da.argmax()) == 2
    assert int(da.argmin()) == 0
    t = np.array(["2017-01-02", "NaT", "2017-01-01"], "datetime64[ns]")
    dt = xrlite.DataArray(t, dims=("p",))
    assert int(dt.argmin()) == 2
    assert int(dt.argmax()) == 0
    # per-dim variant
    m = xrlite.DataArray(np.array([[1.0, np.nan], [np.nan, 2.0]]),
                         dims=("a", "b"))
    np.testing.assert_array_equal(m.argmax(dim="b").values, [0, 1])


def test_nat_is_null():
    t = np.array(["2017-01-01", "NaT"], "datetime64[ns]")
    da = xrlite.DataArray(t, dims=("p",))
    np.testing.assert_array_equal(da.isnull().values, [False, True])
    assert len(da.dropna("p")) == 1


def test_binop_aligns_by_dim_name():
    a = xrlite.DataArray(np.arange(6.0).reshape(2, 3),
                         dims=("ping_time", "range"))
    b = xrlite.DataArray(np.array([10.0, 20.0]), dims=("ping_time",))
    out = a + b  # must broadcast along range, NOT the trailing axis
    np.testing.assert_array_equal(
        out.values, a.values + np.array([[10.0], [20.0]]))
    # reordered dims align by name too
    c = xrlite.DataArray(a.values.T, dims=("range", "ping_time"))
    np.testing.assert_array_equal((a + c).values, a.values * 2)
    # non-subset dims fail loudly, never positional-broadcast silently
    d = xrlite.DataArray(np.zeros(3), dims=("other",))
    with pytest.raises(NotImplementedError):
        a + d


def test_sel_returns_all_matches_on_nonunique_index():
    da = xrlite.DataArray(np.array([0, 1, 2, 3]), dims=("c",),
                          coords={"c": np.array([1, 1, 2, 3])})
    got = da.sel(c=1)
    np.testing.assert_array_equal(got.values, [0, 1])  # dim kept
    assert int(da.sel(c=2)) == 2                       # unique -> scalar


def test_chunk_spec_merges_and_minus_one(tmp_path):
    ds = xrlite.Dataset(
        {"sv": xrlite.DataArray(np.zeros((4, 10, 8), np.float32),
                                dims=("frequency", "ping_time", "range"))})
    ds = ds.chunk({"frequency": 1, "ping_time": 5})
    ds = ds.chunk({"range": -1})  # -1 = whole dim; earlier spec KEPT
    ds.to_zarr(str(tmp_path / "s.zarr"), mode="w")
    from crimac_unet_tpu.data.zarrlite import ZArray
    arr = ZArray.open(tmp_path / "s.zarr" / "sv")
    assert arr.chunks == (1, 5, 8)


def test_append_never_truncates_strings(tmp_path):
    store = str(tmp_path / "s.zarr")
    mk = lambda names: xrlite.Dataset(
        {"sv": xrlite.DataArray(np.zeros((len(names), 4), np.float32),
                                dims=("ping_time", "range"))},
        coords={"raw_file": xrlite.DataArray(np.array(names),
                                             dims=("ping_time",),
                                             name="raw_file")})
    mk(["short.raw"] * 3).to_zarr(store, mode="w")
    # longer names on append: must round-trip (widened store), not clip
    long = ["a_much_longer_echogram_name-D20170427-T062615.raw"] * 2
    mk(long).to_zarr(store, append_dim="ping_time")
    ds = xrlite.open_zarr(store)
    assert list(ds.raw_file.values[-2:]) == long
    # absurd overflow past the widened width fails LOUDLY
    with pytest.raises(ValueError, match="truncate"):
        mk(["x" * 100]).to_zarr(store, append_dim="ping_time")
