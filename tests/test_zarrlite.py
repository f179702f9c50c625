"""zarrlite round-trip, region, and append tests."""

import json

import numpy as np
import pytest

from crimac_unet_tpu.data.zarrlite import ZArray, ZGroup


def test_roundtrip_basic(tmp_path, rng):
    data = rng.rand(37, 53).astype(np.float32)
    arr = ZArray.create(tmp_path / "a.zarr", data.shape, (16, 16), np.float32,
                        fill_value=np.nan, dims=["ping_time", "range"])
    arr[:, :] = data
    arr2 = ZArray.open(tmp_path / "a.zarr")
    np.testing.assert_array_equal(arr2[:, :], data)
    assert arr2.dims == ["ping_time", "range"]
    # fill_value NaN round-trips through JSON as the string "NaN"
    meta = json.loads((tmp_path / "a.zarr" / ".zarray").read_text())
    assert meta["fill_value"] == "NaN"


def test_region_reads_and_writes(tmp_path, rng):
    data = rng.randint(0, 100, size=(40, 30, 25)).astype(np.int16)
    arr = ZArray.create(tmp_path / "b.zarr", data.shape, (7, 8, 9), np.int16,
                        fill_value=0)
    arr[:, :, :] = data
    np.testing.assert_array_equal(arr[3:21, 5:30, 0:9], data[3:21, 5:30, 0:9])
    np.testing.assert_array_equal(arr[5], data[5])
    # partial overwrite
    arr[10:12, 0:30, 4:7] = 7
    data[10:12, 0:30, 4:7] = 7
    np.testing.assert_array_equal(arr[:, :, :], data)


def test_missing_chunks_read_fill(tmp_path):
    arr = ZArray.create(tmp_path / "c.zarr", (10, 10), (4, 4), np.float64,
                        fill_value=np.nan)
    out = arr[:, :]
    assert np.all(np.isnan(out))


def test_append_along_axis(tmp_path, rng):
    a = rng.rand(2, 11, 6).astype(np.float16)
    b = rng.rand(2, 5, 6).astype(np.float16)
    arr = ZArray.create(tmp_path / "d.zarr", a.shape, (1, 4, 6), np.float16,
                        fill_value=0)
    arr[:, :, :] = a
    arr.append(b, axis=1)
    assert arr.shape == (2, 16, 6)
    got = ZArray.open(tmp_path / "d.zarr")[:, :, :]
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=1))


def test_datetime64_coord(tmp_path):
    times = (np.datetime64("2017-04-27T00:00:00", "ns")
             + np.arange(50) * np.timedelta64(1, "s"))
    arr = ZArray.create(tmp_path / "t.zarr", times.shape, (16,),
                        times.dtype, fill_value=None, compressor=None)
    arr[:] = times
    np.testing.assert_array_equal(ZArray.open(tmp_path / "t.zarr")[:], times)


def test_group(tmp_path, rng):
    g = ZGroup.create(tmp_path / "g.zarr", attrs={"description": "test"})
    g.create_array("sv", (4, 20, 10), (4, 8, 10), np.float32,
                   fill_value=np.nan, dims=["frequency", "ping_time", "range"])
    data = rng.rand(4, 20, 10).astype(np.float32)
    g["sv"][:, :, :] = data
    g2 = ZGroup.open(tmp_path / "g.zarr")
    assert g2.attrs["description"] == "test"
    assert "sv" in g2
    np.testing.assert_array_equal(g2["sv"][:, :, :], data)


def test_zarr_interop_layout(tmp_path, rng):
    """The on-disk bytes must be decodable by a plain zlib+reshape reader —
    i.e. what stock zarr v2 would do."""
    import zlib
    data = rng.rand(8, 8).astype(np.float32)
    arr = ZArray.create(tmp_path / "i.zarr", (8, 8), (8, 8), np.float32,
                        fill_value=0)
    arr[:, :] = data
    raw = zlib.decompress((tmp_path / "i.zarr" / "0.0").read_bytes())
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.float32).reshape(8, 8), data)


def test_strided_slices_rejected(tmp_path):
    """zarrlite reads are contiguous-only; a silent step-discard used to
    return wrong data for arr[::2] (code-review finding)."""
    from crimac_unet_tpu.data.zarrlite import ZGroup
    g = ZGroup.create(tmp_path / "g")
    a = g.create_array("x", (10,), (4,), np.float32, fill_value=0)
    a[:] = np.arange(10, dtype=np.float32)
    with pytest.raises(NotImplementedError):
        a[::2]
    with pytest.raises(NotImplementedError):
        a[::-1]


def test_shrink_then_grow_reads_fill_not_stale(tmp_path):
    """resize-shrink deletes now-out-of-bounds chunk files like
    zarr-python, so a later grow reads fill_value, not resurrected stale
    data (code-review finding)."""
    from crimac_unet_tpu.data.zarrlite import ZGroup
    g = ZGroup.create(tmp_path / "g")
    a = g.create_array("x", (20,), (10,), np.float32, fill_value=0)
    a[:] = np.arange(20, dtype=np.float32)
    a.resize((5,))
    a.resize((20,))
    out = a[:]
    np.testing.assert_array_equal(out[:5], np.arange(5))
    # rows 10-19 lived in a fully-deleted chunk -> fill; rows 5-9 live in
    # the kept boundary chunk (stock zarr keeps those bytes too)
    np.testing.assert_array_equal(out[10:], np.zeros(10))


def test_shrink_to_zero_unlinks_all_chunks(tmp_path):
    """Shrinking a dimension to 0 (the resume-truncation-to-start case)
    must unlink every chunk, including chunk 0, so regrowth reads fill
    (advisor finding r2)."""
    from crimac_unet_tpu.data.zarrlite import ZGroup
    g = ZGroup.create(tmp_path / "g")
    a = g.create_array("x", (20,), (10,), np.float32, fill_value=0)
    a[:] = np.arange(1, 21, dtype=np.float32)
    a.resize((0,))
    assert not list((tmp_path / "g" / "x").glob("[0-9]*"))
    a.resize((20,))
    np.testing.assert_array_equal(a[:], np.zeros(20))


class TestReadInto:
    """zarrlite.read_into: native decode+scatter straight into a strided
    destination (the HWC slab hot path) vs the numpy equivalent."""

    def _mk(self, tmp_path, compressor="blosc", fill=np.nan):
        from crimac_unet_tpu.data.zarrlite import ZGroup
        g = ZGroup.create(tmp_path / "g")
        rng = np.random.RandomState(5)
        data = rng.randn(4, 50, 30).astype(np.float32)
        comp = ({"id": "blosc", "cname": "lz4", "clevel": 5,
                 "shuffle": 1} if compressor == "blosc" else
                {"id": "zlib", "level": 1} if compressor == "zlib"
                else None)
        a = g.create_array("sv", (4, 50, 30), (1, 16, 16), np.float32,
                           fill_value=fill, compressor=comp)
        a[:] = data
        return a, data

    @pytest.mark.parametrize("compressor", ["blosc", "zlib", None])
    def test_transposed_scatter_matches_numpy(self, tmp_path, compressor):
        a, data = self._mk(tmp_path, compressor)
        sel = (slice(0, 4), slice(3, 41), slice(2, 29))
        dst = np.zeros((40, 45, 4), np.float32)
        idx = np.s_[1:28, 5:43, :]
        a.read_into(sel, dst, idx, axes=(2, 1, 0))
        want = np.zeros_like(dst)
        want[idx] = data[sel].transpose(2, 1, 0)
        np.testing.assert_array_equal(dst, want)

    def test_missing_chunks_fill(self, tmp_path):
        import os
        a, data = self._mk(tmp_path, "blosc", fill=np.nan)
        # delete one chunk file -> its region must read as fill (NaN)
        os.remove(a.path / "0.1.0")
        sel = (slice(0, 4), slice(0, 50), slice(0, 30))
        dst = np.zeros((30, 50, 4), np.float32)
        a.read_into(sel, dst, np.s_[:, :, :], axes=(2, 1, 0))
        want = data.copy()
        want[0, 16:32, 0:16] = np.nan
        np.testing.assert_array_equal(dst, want.transpose(2, 1, 0))

    def test_identity_axes_and_shape_check(self, tmp_path):
        a, data = self._mk(tmp_path)
        dst = np.zeros((4, 10, 30), np.float32)
        a.read_into((slice(0, 4), slice(5, 15), slice(0, 30)),
                    dst, np.s_[:, :, :])
        np.testing.assert_array_equal(dst, data[:, 5:15, :])
        with pytest.raises(ValueError, match="transposed"):
            a.read_into((slice(0, 4), slice(5, 15), slice(0, 30)),
                        dst, np.s_[:, :5, :])

    def test_dtype_mismatch_falls_back(self, tmp_path):
        a, data = self._mk(tmp_path)
        dst = np.zeros((4, 50, 30), np.float64)
        a.read_into((slice(0, 4), slice(0, 50), slice(0, 30)),
                    dst, np.s_[:, :, :])
        np.testing.assert_array_equal(dst, data.astype(np.float64))

    def test_randomized_scatter_fuzz(self, tmp_path):
        """Randomized selections / destination offsets / axis
        permutations / missing chunks against the numpy oracle — guards
        the native box/stride arithmetic."""
        import itertools
        import os
        from crimac_unet_tpu.data.zarrlite import ZGroup
        rng = np.random.RandomState(11)
        g = ZGroup.create(tmp_path / "g")
        shape, chunks = (3, 37, 23), (2, 8, 7)
        data = rng.randn(*shape).astype(np.float32)
        a = g.create_array("x", shape, chunks, np.float32,
                           fill_value=-7.5,
                           compressor={"id": "blosc", "cname": "lz4",
                                       "clevel": 3, "shuffle": 2})
        a[:] = data
        # random missing chunks read as fill
        want_full = data.copy()
        for cidx in [(0, 1, 2), (1, 4, 0)]:
            os.remove(a.path / ".".join(map(str, cidx)))
            sl = tuple(slice(ci * c, min((ci + 1) * c, s))
                       for ci, c, s in zip(cidx, chunks, shape))
            want_full[sl] = -7.5
        perms = list(itertools.permutations(range(3)))
        for trial in range(25):
            sel = tuple(slice(lo, lo + 1 + rng.randint(s - lo))
                        for s, lo in ((s, rng.randint(s))
                                      for s in shape))
            axes = perms[rng.randint(len(perms))]
            res_shape = tuple(s.stop - s.start for s in sel)
            tshape = tuple(res_shape[ax] for ax in axes)
            pad = [rng.randint(4) for _ in range(3)]
            dst = np.full(tuple(t + p + 2 for t, p in zip(tshape, pad)),
                          99.0, np.float32)
            idx = tuple(slice(p, p + t) for p, t in zip(pad, tshape))
            a.read_into(sel, dst, idx, axes=axes)
            want = np.full_like(dst, 99.0)
            want[idx] = want_full[sel].transpose(axes)
            np.testing.assert_array_equal(dst, want, err_msg=str(
                (trial, sel, axes, pad)))

    def test_rejects_copy_destination(self, tmp_path):
        """Advanced indexing makes dst[idx] a copy — writes would be
        silently lost; read_into must reject it."""
        a, _ = self._mk(tmp_path)
        dst = np.zeros((4, 50, 30), np.float32)
        with pytest.raises(ValueError, match="basic slicing"):
            a.read_into((slice(0, 4), slice(0, 50), slice(0, 30)),
                        dst, (np.array([0, 1, 2, 3]), slice(None),
                              slice(None)))

    def test_empty_region_is_noop(self, tmp_path):
        """Zero-extent selections are valid no-ops (review finding r3:
        may_share_memory is False for zero-size views and used to trip
        the copy guard)."""
        a, _ = self._mk(tmp_path)
        dst = np.full((4, 10, 30), 5.0, np.float32)
        a.read_into((slice(0, 4), slice(5, 5), slice(0, 30)),
                    dst, np.s_[:, 0:0, :])
        np.testing.assert_array_equal(dst, np.full_like(dst, 5.0))


# --------------------------------------------------------- xarray interop
# Real xarray's to_zarr never writes raw <M8[ns] or |S fixed-width: time
# coordinates are CF-encoded (int64/float64 + units attr) and string
# coordinates go through the numcodecs vlen-utf8 filter as object arrays.
# Production CRIMAC survey stores carry both conventions.

def _write_vlen_utf8_array(path, strings, chunks, compressor):
    """Hand-craft a zarr v2 vlen-utf8 object array exactly as
    numcodecs.VLenUTF8 + zarr would lay it out on disk."""
    import os
    from pathlib import Path

    from crimac_unet_tpu.data.zarrlite import _Codec, _atomic_write_json
    os.makedirs(path)
    n = len(strings)
    _atomic_write_json(Path(path) / ".zarray", {
        "zarr_format": 2, "shape": [n], "chunks": [chunks],
        "dtype": "|O", "compressor": compressor,
        "fill_value": 0, "order": "C",
        "filters": [{"id": "vlen-utf8"}]})
    _atomic_write_json(Path(path) / ".zattrs",
                       {"_ARRAY_DIMENSIONS": ["ping_time"]})
    for ci in range((n + chunks - 1) // chunks):
        items = strings[ci * chunks:(ci + 1) * chunks]
        items = list(items) + [""] * (chunks - len(items))  # pad chunk
        frame = len(items).to_bytes(4, "little")
        for s in items:
            b = s.encode("utf-8")
            frame += len(b).to_bytes(4, "little") + b
        with open(Path(path) / str(ci), "wb") as f:
            f.write(_Codec.encode(frame, compressor, typesize=1))


def test_vlen_utf8_read(tmp_path):
    from crimac_unet_tpu.data.zarrlite import default_blosc_compressor
    strings = [f"2019847-D2019051{i}-T{i:06d}.raw" for i in range(7)]
    path = tmp_path / "raw_file"
    _write_vlen_utf8_array(str(path), strings, chunks=3,
                           compressor=default_blosc_compressor())
    a = ZArray.open(path)
    got = a[:]
    assert got.dtype == object
    assert list(got) == strings
    # partial + multi-chunk reads
    assert list(a[2:6]) == strings[2:6]
    # writes are rejected loudly (object.tobytes would store pointers)
    with pytest.raises(NotImplementedError):
        a[0:3] = np.array(["x", "y", "z"], dtype=object)
    with pytest.raises(NotImplementedError):
        a.append(np.array(["w"], dtype=object), axis=0)


def test_vlen_utf8_rejects_other_filters(tmp_path):
    from crimac_unet_tpu.data.zarrlite import _atomic_write_json
    path = tmp_path / "bad"
    path.mkdir()
    _atomic_write_json(path / ".zarray", {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f4",
        "compressor": None, "fill_value": 0, "order": "C",
        "filters": [{"id": "delta"}]})
    with pytest.raises(ValueError, match="unsupported filters"):
        ZArray.open(path)


def test_decode_cf_time():
    from crimac_unet_tpu.data.zarrlite import decode_cf_time

    # int64 seconds since a spaced timestamp (xarray's usual format)
    vals = np.array([0, 1, 90, 86400], np.int64)
    got = decode_cf_time(vals, {"units": "seconds since 2017-04-27 06:26:00",
                                "calendar": "proleptic_gregorian"})
    want = (np.datetime64("2017-04-27T06:26:00", "ns")
            + vals * np.timedelta64(1_000_000_000, "ns"))
    np.testing.assert_array_equal(got, want)

    # float64 days with NaN -> NaT
    vals = np.array([0.5, np.nan], np.float64)
    got = decode_cf_time(vals, {"units": "days since 1970-01-01"})
    assert got[0] == np.datetime64("1970-01-01T12:00:00", "ns")
    assert np.isnat(got[1])

    # raw datetime64 and unitless arrays pass through
    dt = np.array(["2017-04-27T06:26:00"], "datetime64[ns]")
    np.testing.assert_array_equal(decode_cf_time(dt, {}), dt)
    plain = np.arange(4.0)
    np.testing.assert_array_equal(decode_cf_time(plain, {}), plain)

    with pytest.raises(ValueError, match="CF time unit"):
        decode_cf_time(np.array([1]), {"units": "fortnights since 1970-01-01"})
    with pytest.raises(ValueError, match="calendar"):
        decode_cf_time(np.array([1]),
                       {"units": "seconds since 1970-01-01",
                        "calendar": "360_day"})


# ------------------------------------------------------ consolidated metadata
# The reference consolidates its rechunk outputs (rechunk_zarr.py:51) and
# production stores written by xarray to_zarr carry .zmetadata; zarrlite
# writes the same document and keeps it from going stale across appends.

def test_consolidate_metadata_document(tmp_path):
    from crimac_unet_tpu.data.zarrlite import consolidate_metadata
    g = ZGroup.create(tmp_path / "g.zarr", attrs={"description": "t"})
    a = g.create_array("sv", (4, 6), (2, 6), np.float32, fill_value=np.nan,
                       dims=["ping_time", "range"])
    a[:, :] = np.arange(24, dtype=np.float32).reshape(4, 6)
    doc = g.consolidate()
    assert (tmp_path / "g.zarr" / ".zmetadata").is_file()
    on_disk = json.loads((tmp_path / "g.zarr" / ".zmetadata").read_text())
    assert on_disk == doc
    assert doc["zarr_consolidated_format"] == 1
    md = doc["metadata"]
    # every per-key metadata file is present and byte-faithful
    assert md[".zgroup"] == {"zarr_format": 2}
    assert md[".zattrs"] == {"description": "t"}
    assert md["sv/.zarray"] == json.loads(
        (tmp_path / "g.zarr" / "sv" / ".zarray").read_text())
    assert md["sv/.zattrs"] == {"_ARRAY_DIMENSIONS": ["ping_time", "range"]}
    # not a group -> loud error
    with pytest.raises(FileNotFoundError):
        consolidate_metadata(tmp_path / "nope")


def test_consolidated_metadata_never_stale(tmp_path):
    g = ZGroup.create(tmp_path / "g.zarr")
    a = g.create_array("x", (0, 5), (4, 5), np.float32, fill_value=0,
                       dims=["ping_time", "range"])
    g.consolidate()
    zm = tmp_path / "g.zarr" / ".zmetadata"
    assert zm.is_file()
    # any shape-changing write drops the snapshot (real-zarr readers must
    # never see a stale shape through open_consolidated)
    a.append(np.ones((3, 5), np.float32), axis=0)
    assert not zm.is_file()
    doc = g.consolidate()
    assert doc["metadata"]["x/.zarray"]["shape"] == [3, 5]
    a.resize([1, 5])
    assert not zm.is_file()
    # group attr writes invalidate too
    g.consolidate()
    g.attrs["note"] = "updated"
    g.save_attrs()
    assert not zm.is_file()


def test_invalidate_precedes_metadata_commit(tmp_path, monkeypatch):
    """A kill between the .zarray commit and the snapshot drop must not
    leave a stale .zmetadata — so the drop must happen FIRST."""
    from crimac_unet_tpu.data import zarrlite as zl
    g = ZGroup.create(tmp_path / "g.zarr")
    a = g.create_array("x", (0, 3), (4, 3), np.float32, fill_value=0,
                       dims=["ping_time", "range"])
    g.consolidate()
    zm = tmp_path / "g.zarr" / ".zmetadata"
    orig = zl._atomic_write_json

    def boom(path, obj):
        if path.name == ".zarray":
            raise RuntimeError("crash before metadata commit")
        return orig(path, obj)

    monkeypatch.setattr(zl, "_atomic_write_json", boom)
    with pytest.raises(RuntimeError):
        a.append(np.ones((2, 3), np.float32), axis=0)
    monkeypatch.setattr(zl, "_atomic_write_json", orig)
    # the snapshot is gone even though the shape commit never happened:
    # readers fall back to the (consistent) per-array metadata
    assert not zm.is_file()
    assert ZArray.open(tmp_path / "g.zarr" / "x").shape == (0, 3)


def test_open_consolidated(tmp_path):
    """The snapshot fast path must reproduce plain open exactly —
    arrays, attrs, dims, data, vlen strings — from ONE metadata read."""
    from crimac_unet_tpu.data.zarrlite import default_blosc_compressor
    g = ZGroup.create(tmp_path / "g.zarr", attrs={"description": "t"})
    sv = g.create_array("sv", (2, 5), (2, 5), np.float32, fill_value=np.nan,
                        dims=["ping_time", "range"],
                        compressor=default_blosc_compressor())
    sv[:, :] = np.arange(10, dtype=np.float32).reshape(2, 5)
    _write_vlen_utf8_array(str(tmp_path / "g.zarr" / "raw_file"),
                           ["a.raw", "b.raw"], chunks=2,
                           compressor=default_blosc_compressor())
    g.consolidate()

    gc = ZGroup.open_consolidated(tmp_path / "g.zarr")
    assert gc.attrs == {"description": "t"}
    np.testing.assert_array_equal(gc["sv"][:, :], sv[:, :])
    assert gc["sv"].dims == ["ping_time", "range"]
    assert list(gc["raw_file"][:]) == ["a.raw", "b.raw"]
    # the snapshot was the only metadata read: delete the per-array
    # files and the consolidated group still serves everything
    (tmp_path / "g.zarr" / "sv" / ".zarray").unlink()
    gc2 = ZGroup.open_consolidated(tmp_path / "g.zarr")
    np.testing.assert_array_equal(gc2["sv"][:, :], sv[:, :])

    # no snapshot -> FileNotFoundError (callers fall back to open())
    g2 = ZGroup.create(tmp_path / "plain.zarr")
    with pytest.raises(FileNotFoundError):
        ZGroup.open_consolidated(tmp_path / "plain.zarr")
    # malformed snapshot -> loud ValueError
    (tmp_path / "plain.zarr" / ".zmetadata").write_text(
        '{"zarr_consolidated_format": 2, "metadata": {}}')
    with pytest.raises(ValueError, match="consolidated format"):
        ZGroup.open_consolidated(tmp_path / "plain.zarr")


def test_consolidated_group_membership_coherent(tmp_path):
    """array_names/__contains__ must answer from the snapshot too, not
    just the directory listing."""
    g = ZGroup.create(tmp_path / "g.zarr")
    g.create_array("sv", (2, 2), (2, 2), np.float32, fill_value=0,
                   dims=["ping_time", "range"])
    g.consolidate()
    gc = ZGroup.open_consolidated(tmp_path / "g.zarr")
    (tmp_path / "g.zarr" / "sv" / ".zarray").unlink()
    assert "sv" in gc
    assert gc.array_names() == ["sv"]


def test_out_of_bounds_integer_index_raises(tmp_path):
    """zarr/numpy raise IndexError on OOB integer indices; silently
    serving FILL (reads) or phantom chunk files (writes) hid caller
    off-by-ones as wrong data (review finding)."""
    a = ZArray.create(tmp_path / "a.zarr", (5,), (5,), np.float32,
                      fill_value=7)
    a[:] = np.arange(5, dtype=np.float32)
    with pytest.raises(IndexError):
        a[10]
    with pytest.raises(IndexError):
        a[-6]
    with pytest.raises(IndexError):
        a[10] = 3.0
    # growth after the rejected write sees fill, not a phantom value
    a.resize([12])
    assert float(a[10]) == 7.0
    # slices still clamp like numpy
    assert a[10:99].shape == (2,)


def test_interrupted_shrink_never_resurfaces_on_grow(tmp_path):
    """resize-shrink commits the smaller shape BEFORE unlinking the
    out-of-bounds chunk files; a crash in that window leaves stale chunk
    files behind.  resize-GROW must treat them as garbage — unlinking
    anything fully outside the committed shape before exposing the new
    one — so the regrown region reads as fill, never as pre-shrink data
    (review finding r3)."""
    a = ZArray.create(tmp_path / "x", (12,), (4,), np.float32,
                      fill_value=0.0)
    a[:] = np.arange(12, dtype=np.float32)
    # emulate the crash: commit the shrunken shape directly, skipping the
    # unlink loop (exactly the state a kill after _write_meta leaves)
    a.meta["shape"] = [4]
    a.shape = (4,)
    a._write_meta()
    b = ZArray.open(tmp_path / "x")
    assert b.shape == (4,)
    assert (tmp_path / "x" / "1").is_file()  # the stale leftover
    b.resize([12])
    out = b[:]
    np.testing.assert_array_equal(out[:4], np.arange(4, dtype=np.float32))
    # stale chunks 1-2 must NOT resurface as the pre-shrink 4..11
    np.testing.assert_array_equal(out[4:], np.zeros(8, np.float32))


def test_interrupted_shrink_to_zero_then_grow(tmp_path):
    """Same crash window with a shrink to length 0 (the resume
    truncation to start_ping=0 case): even chunk 0 is stale and must be
    dropped by the next grow."""
    a = ZArray.create(tmp_path / "x", (6,), (4,), np.float32,
                      fill_value=0.0)
    a[:] = np.arange(6, dtype=np.float32)
    a.meta["shape"] = [0]
    a.shape = (0,)
    a._write_meta()
    b = ZArray.open(tmp_path / "x")
    b.resize([6])
    np.testing.assert_array_equal(b[:], np.zeros(6, np.float32))


def test_group_create_invalidates_enclosing_snapshot(tmp_path):
    """Creating a child group inside a consolidated tree drops the
    enclosing .zmetadata (it lacks the new child — real-zarr
    open_consolidated readers would otherwise never see it)."""
    g = ZGroup.create(tmp_path / "g.zarr")
    g.create_array("x", (2,), (2,), np.float32, fill_value=0)
    g.consolidate()
    zm = tmp_path / "g.zarr" / ".zmetadata"
    assert zm.is_file()
    ZGroup.create(tmp_path / "g.zarr" / "sub")
    assert not zm.is_file()
    doc = g.consolidate()
    assert "sub/.zgroup" in doc["metadata"]
