"""zarrlite — a self-contained zarr-v2 directory-store implementation.

The reference framework's on-disk survey contract is zarr v2 directories
(``<survey>_sv.zarr`` / ``_labels.zarr`` / ``_bottom.zarr``, written with
xarray; reference data/data_reader.py:516-575 and
pipeline_train_predict/save_predict.py:124-134).  The zarr/xarray packages
are not available in this environment, so this module implements the zarr v2
format directly: ``.zgroup`` / ``.zarray`` / ``.zattrs`` JSON metadata,
C-order chunk files named ``i.j.k``, Blosc (zstd/lz4/zlib/... via the
native chunkio/libblosc backends in :mod:`.blosc_codec`) / zlib / raw
codecs, and the xarray ``_ARRAY_DIMENSIONS`` convention — stores written
here open unmodified in stock zarr+xarray, and vice versa, including the
production Blosc-compressed CRIMAC stores and the reference's own
prediction output codec (``Blosc(cname="zstd", clevel=3,
shuffle=BITSHUFFLE)``, save_predict.py:128).

Supports region reads, region writes, and append along any axis (the
``ping_time`` append used by prediction writing with ``resume_writing``,
reference save_predict.py:124-134).  Writes are crash-consistent: chunk
files and metadata are written atomically (tmp + rename), and ``append``
commits chunk data BEFORE growing the ``.zarray`` shape, so a crash
mid-append leaves a consistent store at the previous high-water mark
instead of phantom fill-value pings.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import zlib
from pathlib import Path

import numpy as np

from . import blosc_codec

_ZARR_FORMAT = 2


def default_blosc_compressor() -> dict | None:
    """The zarr/xarray default chunk codec (Blosc lz4-5 byte-shuffle) when a
    blosc backend is loadable, else zlib — used for new survey stores so
    fixtures match production CRIMAC layouts."""
    if blosc_codec.available():
        return {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
                "blocksize": 0}
    return {"id": "zlib", "level": 1}


def prediction_compressor() -> dict | None:
    """The reference's prediction codec: Blosc zstd-3 BITSHUFFLE
    (save_predict.py:128); zlib when no blosc backend is loadable."""
    if blosc_codec.available():
        return {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2,
                "blocksize": 0}
    return {"id": "zlib", "level": 1}


def _encode_fill_value(v, dtype: np.dtype):
    if v is None:
        return None
    if np.issubdtype(dtype, np.floating):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return v
    if np.issubdtype(dtype, np.integer) or np.issubdtype(dtype, np.bool_):
        return int(v)
    return v


def _decode_fill_value(v, dtype: np.dtype):
    if v is None:
        return None
    if isinstance(v, str):
        if v == "NaN":
            return np.nan
        if v == "Infinity":
            return np.inf
        if v == "-Infinity":
            return -np.inf
    return np.array(v, dtype=dtype)[()]


class _Codec:
    """Chunk compressor registry: ``null`` (raw), ``zlib`` and ``blosc``
    (any cname/shuffle, via the native backends in :mod:`.blosc_codec`)."""

    @staticmethod
    def encode(buf: bytes, compressor: dict | None, typesize: int = 1) -> bytes:
        if compressor is None:
            return buf
        cid = compressor.get("id")
        if cid == "zlib":
            return zlib.compress(buf, compressor.get("level", 1))
        if cid == "blosc":
            return blosc_codec.compress(
                buf, typesize, clevel=int(compressor.get("clevel", 5)),
                shuffle=int(compressor.get("shuffle", 1)),
                cname=compressor.get("cname", "lz4"))
        raise ValueError(f"Unsupported compressor: {compressor}")

    @staticmethod
    def decode(buf: bytes, compressor: dict | None) -> bytes:
        if compressor is None:
            return buf
        cid = compressor.get("id")
        if cid == "zlib":
            return zlib.decompress(buf)
        if cid == "blosc":
            return blosc_codec.decompress(buf)
        raise ValueError(f"Unsupported compressor: {compressor}")


def _decode_vlen_utf8(buf: bytes, shape) -> np.ndarray:
    """Decode a numcodecs VLenUTF8 frame: uint32-LE item count, then per
    item uint32-LE byte length + utf-8 payload (the format real
    xarray/zarr uses for string coordinates such as ``raw_file``)."""
    n_expected = int(np.prod(shape)) if len(shape) else 1
    if len(buf) < 4:
        raise ValueError("vlen-utf8 frame shorter than its header")
    n = int.from_bytes(buf[:4], "little")
    if n != n_expected:
        raise ValueError(f"vlen-utf8 frame holds {n} items, chunk shape "
                         f"{tuple(shape)} needs {n_expected}")
    out = np.empty(n, dtype=object)
    off = 4
    for i in range(n):
        if off + 4 > len(buf):
            raise ValueError("truncated vlen-utf8 frame (length header)")
        ln = int.from_bytes(buf[off:off + 4], "little")
        off += 4
        if off + ln > len(buf):
            raise ValueError("truncated vlen-utf8 frame (payload)")
        out[i] = buf[off:off + ln].decode("utf-8")
        off += ln
    return out.reshape(shape)


_CF_TIME_NS = {
    "nanoseconds": 1, "nanosecond": 1,
    "microseconds": 1_000, "microsecond": 1_000,
    "milliseconds": 1_000_000, "millisecond": 1_000_000,
    "seconds": 1_000_000_000, "second": 1_000_000_000,
    "minutes": 60 * 1_000_000_000, "minute": 60 * 1_000_000_000,
    "hours": 3_600 * 1_000_000_000, "hour": 3_600 * 1_000_000_000,
    "days": 86_400 * 1_000_000_000, "day": 86_400 * 1_000_000_000,
}


def decode_cf_time(values: np.ndarray, attrs: dict) -> np.ndarray:
    """CF-convention time decode: real xarray never writes raw
    datetime64 — ``to_zarr`` encodes time coordinates as int64/float64
    offsets with ``units = "<unit> since <timestamp>"`` (and usually
    ``calendar = "proleptic_gregorian"``).  Returns datetime64[ns]
    (float NaN -> NaT); passes already-datetime64 arrays and arrays
    without a CF units attr through unchanged, so stores written by this
    module (raw ``<M8[ns]``) and by production xarray both decode."""
    values = np.asarray(values)
    if np.issubdtype(values.dtype, np.datetime64):
        return values.astype("datetime64[ns]")
    units = attrs.get("units")
    if not isinstance(units, str) or " since " not in units:
        return values
    unit, base = units.split(" since ", 1)
    scale = _CF_TIME_NS.get(unit.strip().lower())
    if scale is None:
        raise ValueError(f"unsupported CF time unit in {units!r}")
    cal = str(attrs.get("calendar", "proleptic_gregorian")).lower()
    if cal not in ("proleptic_gregorian", "standard", "gregorian"):
        raise ValueError(f"unsupported CF calendar {cal!r}")
    # "1970-01-01 00:00:00[.ffffff]" -> ISO "T" form for np.datetime64
    base = base.strip().replace(" ", "T")
    base_ns = np.datetime64(base, "ns")
    if np.issubdtype(values.dtype, np.floating):
        nat = ~np.isfinite(values)
        ns = np.round(np.where(nat, 0.0, values) * scale).astype(np.int64)
        out = base_ns + ns.astype("timedelta64[ns]")
        out[nat] = np.datetime64("NaT")
        return out
    ns = values.astype(np.int64) * scale
    return base_ns + ns.astype("timedelta64[ns]")


def _invalidate_consolidated(start: Path) -> None:
    """Unlink ``.zmetadata`` on ``start`` and every enclosing zarr group:
    after an array's .zarray changes, a consolidated snapshot anywhere up
    the group chain no longer matches the authoritative per-array files."""
    p = Path(start)
    while (p / ".zgroup").is_file():
        (p / ".zmetadata").unlink(missing_ok=True)
        if p.parent == p:
            break
        p = p.parent


def consolidate_metadata(root) -> dict:
    """Write zarr v2 *consolidated metadata* for the group tree at
    ``root`` — the ``.zmetadata`` document ``zarr.convenience.
    consolidate_metadata`` produces (the reference consolidates its
    rechunk outputs, rechunk_zarr.py:51, and production CRIMAC stores
    written by xarray ``to_zarr`` carry it): every ``.zgroup`` /
    ``.zattrs`` / ``.zarray`` under the root gathered into one JSON doc

        {"zarr_consolidated_format": 1,
         "metadata": {"<relkey>/.zarray": {...}, ...}}

    so readers using ``zarr.open_consolidated`` (xarray's default) open
    our output stores without per-key directory listings. Atomic write;
    returns the document. Per-array files stay authoritative for
    zarrlite itself — any later shape change drops the snapshot (see
    ``_invalidate_consolidated``) until the writer re-consolidates."""
    root = Path(root)
    if not (root / ".zgroup").is_file():
        raise FileNotFoundError(f"not a zarr group: {root}")
    meta = {}
    # probe the three fixed metadata names per DIRECTORY instead of
    # listing the whole tree: a production store holds 10^5+ chunk files
    # and rglob would materialize every one to find ~a dozen JSON files
    for dirpath, dirnames, _filenames in os.walk(root):
        dirnames.sort()
        d = Path(dirpath)
        prefix = d.relative_to(root).as_posix()
        for name in (".zgroup", ".zattrs", ".zarray"):
            p = d / name
            if p.is_file():
                key = name if prefix == "." else f"{prefix}/{name}"
                with open(p) as f:
                    meta[key] = json.load(f)
    doc = {"zarr_consolidated_format": 1, "metadata": meta}
    _atomic_write_json(root / ".zmetadata", doc)
    return doc


def _atomic_write_json(path: Path, obj) -> None:
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ZArray:
    """One zarr v2 array backed by a directory of chunk files."""

    def __init__(self, path, meta: dict, attrs: dict):
        self.path = Path(path)
        self.meta = meta
        self.attrs = attrs
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self.compressor = meta.get("compressor")
        self.fill_value = _decode_fill_value(meta.get("fill_value"), self.dtype)
        # validation of a FOREIGN on-disk store: must survive python -O
        # (a stripped guard would decode garbage, not raise)
        if meta.get("order", "C") != "C":
            raise ValueError("only C order supported")
        filters = meta.get("filters") or []
        # real xarray/zarr writes string coordinates (e.g. raw_file) as
        # object arrays behind the numcodecs vlen-utf8 filter — accept it
        # read-only so production CRIMAC survey stores open unmodified
        self._vlen_utf8 = (len(filters) == 1
                           and filters[0].get("id") == "vlen-utf8")
        if filters and not self._vlen_utf8:
            raise ValueError(f"unsupported filters: {filters}")
        if self._vlen_utf8 and self.dtype != np.dtype(object):
            raise ValueError(
                f"vlen-utf8 filter requires object dtype, got {self.dtype}")
        if self.dtype == np.dtype(object) and not self._vlen_utf8:
            raise ValueError("object dtype requires the vlen-utf8 filter")

    # ------------------------------------------------------------------ io
    @classmethod
    def open(cls, path) -> "ZArray":
        path = Path(path)
        with open(path / ".zarray") as f:
            meta = json.load(f)
        attrs = {}
        if (path / ".zattrs").is_file():
            with open(path / ".zattrs") as f:
                attrs = json.load(f)
        return cls(path, meta, attrs)

    @classmethod
    def create(cls, path, shape, chunks, dtype, compressor="zlib",
               fill_value=0, attrs=None, dims=None, overwrite=False) -> "ZArray":
        path = Path(path)
        if path.exists():
            if overwrite:
                shutil.rmtree(path)
            else:
                raise FileExistsError(str(path))
        path.mkdir(parents=True)
        dtype = np.dtype(dtype)
        if compressor == "zlib":
            compressor = {"id": "zlib", "level": 1}
        elif compressor == "blosc":
            compressor = default_blosc_compressor()
        elif compressor == "blosc-zstd":
            compressor = prediction_compressor()
        meta = {
            "zarr_format": _ZARR_FORMAT,
            "shape": list(int(s) for s in shape),
            "chunks": list(int(c) for c in chunks),
            "dtype": dtype.str,
            "compressor": compressor,
            "fill_value": _encode_fill_value(fill_value, dtype),
            "order": "C",
            "filters": None,
        }
        attrs = dict(attrs or {})
        if dims is not None:
            attrs["_ARRAY_DIMENSIONS"] = list(dims)
        arr = cls(path, meta, attrs)
        arr._write_meta()
        return arr

    def _write_meta(self) -> None:
        # atomic replace: .zarray is the store's commit point (its shape is
        # the high-water mark resume_writing trusts) — a torn write must
        # never be observable
        # a metadata change (create/append/resize) makes any consolidated
        # metadata on an enclosing group stale — real-zarr readers that
        # open_consolidated would see the OLD shape. Drop it BEFORE the
        # commit: a crash in between leaves a non-consolidated (but
        # consistent) store, never a stale snapshot.
        _invalidate_consolidated(self.path.parent)
        _atomic_write_json(self.path / ".zarray", self.meta)
        _atomic_write_json(self.path / ".zattrs", self.attrs)

    @property
    def dims(self):
        return self.attrs.get("_ARRAY_DIMENSIONS")

    @property
    def ndim(self) -> int:
        return len(self.shape)

    # -------------------------------------------------------------- chunks
    def _chunk_key(self, cidx) -> str:
        return ".".join(str(i) for i in cidx)

    def _read_chunk(self, cidx) -> np.ndarray:
        fname = self.path / self._chunk_key(cidx)
        if not fname.is_file():
            fill = self.fill_value if self.fill_value is not None else 0
            if self._vlen_utf8:
                fill = "" if fill in (None, 0) else fill
            return np.full(self.chunks, fill, dtype=self.dtype)
        with open(fname, "rb") as f:
            raw = _Codec.decode(f.read(), self.compressor)
        if self._vlen_utf8:
            return _decode_vlen_utf8(raw, self.chunks)
        return np.frombuffer(raw, dtype=self.dtype).reshape(self.chunks).copy()

    def _read_chunks_batch(self, chunk_idxs) -> np.ndarray:
        """(n, *chunks) buffer for many chunks at once.  Blosc frames go
        through one native multi-threaded batch-decompress call (chunkio,
        GIL-free); other codecs decode serially here (__getitem__'s zlib
        thread pool is a separate path)."""
        n = len(chunk_idxs)
        out = np.empty((n,) + self.chunks, dtype=self.dtype)
        fill = self.fill_value if self.fill_value is not None else 0
        if self._vlen_utf8:
            # object chunks can't go through the native byte-buffer path
            for i, cidx in enumerate(chunk_idxs):
                out[i] = self._read_chunk(cidx)
            return out
        is_blosc = (self.compressor or {}).get("id") == "blosc"
        frames, rows = [], []
        for i, cidx in enumerate(chunk_idxs):
            fname = self.path / self._chunk_key(cidx)
            if not fname.is_file():
                out[i] = fill
                continue
            if is_blosc:
                with open(fname, "rb") as f:
                    frames.append(f.read())
                rows.append(i)
            else:
                out[i] = self._read_chunk(cidx)
        if is_blosc and frames:
            blosc_codec.batch_decompress_into(frames,
                                              [out[i] for i in rows])
        return out

    def _write_chunk(self, cidx, chunk: np.ndarray) -> None:
        if self._vlen_utf8:
            # vlen-utf8 support is read-only (we write |S fixed-width):
            # object.tobytes() would serialize POINTERS, corrupting the
            # store silently
            raise NotImplementedError(
                "writing vlen-utf8 arrays is not supported")
        if chunk.shape != self.chunks:
            raise ValueError(f"chunk shape {chunk.shape} != {self.chunks}")
        buf = _Codec.encode(np.ascontiguousarray(chunk, dtype=self.dtype)
                            .tobytes(), self.compressor,
                            typesize=self.dtype.itemsize)
        # atomic replace: a read-modify-write of a boundary chunk holds
        # committed data; a torn rewrite must not destroy it
        fname = self.path / self._chunk_key(cidx)
        tmp = fname.with_name(fname.name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, fname)

    # ------------------------------------------------------------- regions
    def _chunk_boxes(self, sel):
        """Yield ``(cidx, src_slices, out_slices)`` for every chunk a
        normalized selection touches: ``src_slices`` index within the
        chunk, ``out_slices`` within the selection's result array.  The
        single source of the chunk-grid intersection arithmetic shared by
        __getitem__, read_into and __setitem__ (it used to be written
        out three times — review finding r3)."""
        import itertools
        ranges = [range(s.start // c, (max(s.stop - 1, s.start)) // c + 1)
                  if s.stop > s.start else range(0)
                  for s, c in zip(sel, self.chunks)]
        for cidx in itertools.product(*ranges):
            src, out = [], []
            for ci, s, c in zip(cidx, sel, self.chunks):
                c0 = ci * c
                a0 = max(s.start, c0)
                a1 = min(s.stop, c0 + c)
                src.append(slice(a0 - c0, a1 - c0))
                out.append(slice(a0 - s.start, a1 - s.start))
            yield cidx, tuple(src), tuple(out)

    def _norm_sel(self, sel) -> tuple:
        if not isinstance(sel, tuple):
            sel = (sel,)
        sel = sel + (slice(None),) * (self.ndim - len(sel))
        out = []
        for i, s in enumerate(sel):
            if isinstance(s, slice):
                if s.step not in (None, 1):
                    raise NotImplementedError(
                        "zarrlite supports only contiguous (step-1) "
                        f"slices, got step={s.step}")
                out.append(slice(*s.indices(self.shape[i])))
            else:
                s = int(s)
                if s < 0:
                    s += self.shape[i]
                if not 0 <= s < self.shape[i]:
                    # zarr/numpy raise here; silently mapping to a
                    # missing chunk returned FILL on reads and created
                    # phantom chunk files on writes that a later
                    # append/resize would resurface as live data
                    raise IndexError(
                        f"index {s} out of bounds for axis {i} with "
                        f"size {self.shape[i]}")
                out.append(slice(s, s + 1))
        return tuple(out)

    def __getitem__(self, sel) -> np.ndarray:
        squeeze = [i for i, s in enumerate(
            sel if isinstance(sel, tuple) else (sel,))
            if isinstance(s, (int, np.integer))]
        sel = self._norm_sel(sel)
        out_shape = tuple(s.stop - s.start for s in sel)
        out = np.empty(out_shape, dtype=self.dtype)

        boxes = {cidx: (src, dstsl)
                 for cidx, src, dstsl in self._chunk_boxes(sel)}
        chunk_idxs = list(boxes)

        def place(cidx, chunk):
            src, dstsl = boxes[cidx]
            out[dstsl] = chunk[src]

        if len(chunk_idxs) >= 2 and \
                (self.compressor or {}).get("id") == "blosc":
            # one native batch-decompress call over all chunks (chunkio
            # fans out std::threads; no per-chunk Python overhead)
            buf = self._read_chunks_batch(chunk_idxs)
            for i, cidx in enumerate(chunk_idxs):
                place(cidx, buf[i])
        elif len(chunk_idxs) >= 4 and self.compressor is not None:
            # zlib.decompress releases the GIL: decode in parallel
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=8) as ex:
                for cidx, chunk in zip(chunk_idxs,
                                       ex.map(self._read_chunk, chunk_idxs)):
                    place(cidx, chunk)
        else:
            for cidx in chunk_idxs:
                place(cidx, self._read_chunk(cidx))
        if squeeze:
            out = np.squeeze(out, axis=tuple(squeeze))
        return out

    def read_into(self, sel, dst, dst_index, axes=None) -> None:
        """Read ``self[sel]`` straight into ``dst[dst_index]`` (optionally
        transposed: the destination region receives
        ``np.transpose(self[sel], axes)``).

        Blosc stores take the native single-pass path: each chunk decodes
        into thread-local scratch and scatters directly into the strided
        destination (chunkio cio_batch_decompress_scatter) — no
        intermediate (n, *chunks) buffer, no separate place + transpose
        copies.  This is the inference hot path: the HWC predict/eval
        slab is (range, ping, channel) while the store is (channel, ping,
        range), so the old route paid decode + place + transpose passes
        per slab (VERDICT r2 #3: host_slab was the e2e wall).
        Non-blosc stores / no native library fall back to the equivalent
        numpy expression."""
        sel = self._norm_sel(sel)
        ndim = self.ndim
        if axes is None:
            axes = tuple(range(ndim))
        dview = dst[dst_index]
        res_shape = tuple(s.stop - s.start for s in sel)
        want = tuple(res_shape[a] for a in axes)
        if dview.shape != want:
            raise ValueError(f"dst region {dview.shape} != transposed "
                             f"read shape {want}")
        if dview.size == 0:
            return  # empty region: nothing to read or write
        if not np.may_share_memory(dview, dst):
            # advanced indexing produced a copy: writes would be lost
            # (may_share_memory is False for zero-size views, hence the
            # empty-region early-out above)
            raise ValueError("read_into dst_index must be basic slicing "
                             "(a view of dst)")

        cvt = 0
        dtype_ok = dst.dtype == self.dtype
        if not dtype_ok and self.dtype == np.float32:
            # converting scatter: float32 store decoded straight into a
            # bfloat16 slab (round-to-nearest-even in native code) — the
            # predict hot path's transfer_dtype, skipping the separate
            # float32 slab + astype pass entirely
            try:
                import ml_dtypes
                if dst.dtype == ml_dtypes.bfloat16 \
                        and blosc_codec.scatter_cvt_available():
                    cvt = blosc_codec.CVT_F32_BF16
                    dtype_ok = True
            except ImportError:
                pass
        native_ok = ((self.compressor or {}).get("id") == "blosc"
                     and dtype_ok and ndim <= 4
                     and self.dtype != np.dtype(object)
                     and blosc_codec.scatter_available())
        if native_ok:
            # dst strides in CHUNK axis order: chunk axis d lives at
            # dview axis axes.index(d)
            inv = [0] * ndim
            for k, a in enumerate(axes):
                inv[a] = k
            dst_strides = [dview.strides[inv[d]] for d in range(ndim)]
            base_off = dview.ctypes.data - dst.ctypes.data

            frames, boxes, offs = [], [], []
            for cidx, src, outsl in self._chunk_boxes(sel):
                boxes.append(([sl.start for sl in src],
                              [sl.stop for sl in src]))
                offs.append(base_off + sum(
                    osl.start * st for osl, st in zip(outsl, dst_strides)))
                fname = self.path / self._chunk_key(cidx)
                if fname.is_file():
                    with open(fname, "rb") as f:
                        frames.append(f.read())
                else:
                    frames.append(None)
            fill = np.asarray(
                self.fill_value if self.fill_value is not None else 0,
                dtype=self.dtype).astype(dst.dtype).tobytes()
            boxes_arr = np.array(boxes, dtype=np.int64)  # (n, 2, ndim)
            if blosc_codec.batch_decompress_scatter(
                    frames, self.chunks, dst.dtype.itemsize, boxes_arr,
                    dst, np.array(offs, dtype=np.int64), dst_strides,
                    fill, cvt=cvt):
                return
        # fallback: materialize + transpose (still one batch decompress)
        dview[...] = np.transpose(self[tuple(sel)], axes)

    def __setitem__(self, sel, value) -> None:
        sel = self._norm_sel(sel)
        value = np.broadcast_to(
            np.asarray(value, dtype=self.dtype),
            tuple(s.stop - s.start for s in sel))
        for cidx, chunk_sl, val_sl in self._chunk_boxes(sel):
            # read-modify-write unless the region covers the full chunk
            full = all(s.start <= ci * c and s.stop >= min((ci + 1) * c, dim)
                       for ci, s, c, dim in
                       zip(cidx, sel, self.chunks, self.shape))
            chunk = (np.full(self.chunks,
                             self.fill_value if self.fill_value is not None
                             else 0, dtype=self.dtype)
                     if full else self._read_chunk(cidx))
            chunk[chunk_sl] = value[val_sl]
            self._write_chunk(cidx, chunk)

    def append(self, value: np.ndarray, axis: int = 0) -> None:
        """Grow the array along ``axis`` and write ``value`` into the new
        region (the zarr append used for ``resume_writing``).

        Crash-consistent: chunk data is written FIRST, and only then is the
        grown shape committed to ``.zarray`` (atomically).  A crash
        mid-append leaves the on-disk shape at the old high-water mark —
        readers and ``resume_writing`` (pipeline/inference.py) never see
        phantom fill-value pings, and the interrupted append can simply be
        re-run."""
        value = np.asarray(value, dtype=self.dtype)
        if value.ndim != self.ndim:
            raise ValueError(f"append value ndim {value.ndim} != array "
                             f"ndim {self.ndim}")
        old = self.shape[axis]
        new_shape = list(self.shape)
        new_shape[axis] = old + value.shape[axis]
        # extend the in-memory shape so __setitem__ can address the grown
        # region; on-disk .zarray still holds the committed (old) shape
        self.shape = tuple(new_shape)
        sel = [slice(None)] * self.ndim
        sel[axis] = slice(old, old + value.shape[axis])
        self[tuple(sel)] = value
        # commit point
        self.meta["shape"] = [int(s) for s in new_shape]
        self._write_meta()

    def resize(self, new_shape) -> None:
        old_shape = self.shape
        new_shape = tuple(int(s) for s in new_shape)
        if any(n > o for n, o in zip(new_shape, old_shape)):
            # GROW: before exposing the larger shape, unlink any chunk
            # files fully outside the committed shape — leftovers from a
            # shrink interrupted between its .zarray commit and its
            # unlink loop (the one crash window in this method).  Done
            # while they are still out-of-bounds garbage, so a crash here
            # leaves the old shape committed and the next grow retries.
            import itertools
            # no max(1, ...) floor on keep: a zero-length committed dim
            # owns NO chunks, so even chunk 0 is stale (e.g. a crash after
            # a resume truncation to start_ping=0 committed shape 0)
            keep = [-(-o // c) for o, c in zip(old_shape, self.chunks)]
            new_grid = [max(1, -(-n // c)) for n, c in zip(new_shape,
                                                           self.chunks)]
            for cidx in itertools.product(*(range(g) for g in new_grid)):
                if all(ci < k for ci, k in zip(cidx, keep)):
                    continue
                p = self.path / self._chunk_key(cidx)
                if p.is_file():
                    p.unlink()
        self.meta["shape"] = list(new_shape)
        self.shape = new_shape
        self._write_meta()
        # zarr-python deletes chunks that fall entirely outside the new
        # shape on shrink; without this, stale chunk files resurface as
        # live data if the array is later grown again (e.g. resume
        # truncation followed by appends)
        if any(n < o for n, o in zip(new_shape, old_shape)):
            import itertools
            # no max(1, ...) floor: shrinking a dimension to 0 (resume
            # truncation to start_ping=0) must unlink ALL chunks, or chunk
            # 0's stale file resurfaces as live data on regrowth
            keep = [-(-n // c) for n, c in zip(new_shape, self.chunks)]
            old_grid = [max(1, -(-o // c)) for o, c in zip(old_shape,
                                                           self.chunks)]
            for cidx in itertools.product(*(range(g) for g in old_grid)):
                if all(ci < k for ci, k in zip(cidx, keep)):
                    continue
                p = self.path / self._chunk_key(cidx)
                if p.is_file():
                    p.unlink()


class ZGroup:
    """A zarr v2 group directory holding named arrays + attrs."""

    def __init__(self, path, attrs: dict):
        self.path = Path(path)
        self.attrs = attrs
        self._arrays: dict[str, ZArray] = {}

    @classmethod
    def open(cls, path) -> "ZGroup":
        path = Path(path)
        if not (path / ".zgroup").is_file():
            raise FileNotFoundError(f"not a zarr group: {path}")
        attrs = {}
        if (path / ".zattrs").is_file():
            with open(path / ".zattrs") as f:
                attrs = json.load(f)
        return cls(path, attrs)

    @classmethod
    def open_consolidated(cls, path) -> "ZGroup":
        """Open through the ``.zmetadata`` snapshot — ONE metadata read
        for the whole store instead of 2-3 JSON files per array, which is
        the point of consolidation on high-latency storage
        (``zarr.open_consolidated`` semantics). Trusts the snapshot: both
        our writers and real xarray consolidate only when a write session
        completes (and our appends drop the snapshot first), so a present
        ``.zmetadata`` is always current; use plain ``open`` if a foreign
        writer might leave stale snapshots behind."""
        path = Path(path)
        zm = path / ".zmetadata"
        if not zm.is_file():
            raise FileNotFoundError(f"no consolidated metadata: {zm}")
        with open(zm) as f:
            doc = json.load(f)
        if doc.get("zarr_consolidated_format") != 1:
            raise ValueError(f"unsupported consolidated format in {zm}")
        md = doc.get("metadata", {})
        if ".zgroup" not in md:
            raise FileNotFoundError(f"not a zarr group: {path}")
        group = cls(path, dict(md.get(".zattrs", {})))
        for key, meta in md.items():
            name, _, leaf = key.rpartition("/")
            if leaf == ".zarray" and name and "/" not in name:
                attrs = dict(md.get(f"{name}/.zattrs", {}))
                group._arrays[name] = ZArray(path / name, dict(meta), attrs)
        return group

    @classmethod
    def create(cls, path, attrs=None, overwrite=False) -> "ZGroup":
        path = Path(path)
        if path.exists():
            if overwrite:
                shutil.rmtree(path)
            else:
                raise FileExistsError(str(path))
        path.mkdir(parents=True)
        # creating a group inside a consolidated tree makes any enclosing
        # .zmetadata snapshot stale (it lacks the new child) — drop it
        # before the child becomes visible, same invariant as
        # ZArray._write_meta
        _invalidate_consolidated(path.parent)
        # atomic like every other metadata write in this module: a crash
        # mid-create must not leave a torn .zgroup/.zattrs that poisons
        # the next resume attempt
        _atomic_write_json(path / ".zgroup", {"zarr_format": _ZARR_FORMAT})
        attrs = dict(attrs or {})
        _atomic_write_json(path / ".zattrs", attrs)
        return cls(path, attrs)

    def array_names(self):
        # union of on-disk arrays and snapshot-loaded ones, so a
        # consolidated group answers coherently even when serving purely
        # from its .zmetadata snapshot
        names = {p.name for p in self.path.iterdir()
                 if (p / ".zarray").is_file()}
        names.update(self._arrays)
        return sorted(names)

    def __contains__(self, name: str) -> bool:
        return (name in self._arrays
                or (self.path / name / ".zarray").is_file())

    def __getitem__(self, name: str) -> ZArray:
        if name not in self._arrays:
            self._arrays[name] = ZArray.open(self.path / name)
        return self._arrays[name]

    def create_array(self, name: str, shape, chunks, dtype, **kw) -> ZArray:
        arr = ZArray.create(self.path / name, shape, chunks, dtype, **kw)
        self._arrays[name] = arr
        return arr

    def save_attrs(self) -> None:
        # invalidate-before-commit, same reasoning as ZArray._write_meta
        _invalidate_consolidated(self.path)
        _atomic_write_json(self.path / ".zattrs", self.attrs)

    def consolidate(self) -> dict:
        """Snapshot the group's metadata into ``.zmetadata`` (zarr v2
        consolidated format); call once a write session is complete."""
        return consolidate_metadata(self.path)
