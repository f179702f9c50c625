"""Eager mini-xarray backed by crimac_unet_tpu.data.zarrlite — TEST HARNESS.

Purpose: the reference's zarr pipeline (data/data_reader.py:510-1146
``DataReaderZarr``, batch/dataset.py:358-407 ``get_crop_zarr``,
pipeline_train_predict/save_predict.py:87-219 zarr writer,
data_preprocessing/memmap_to_zarr.py:34-171 converter) imports ``xarray``
at module scope and drives it through a small, well-defined API subset.
Real xarray/zarr/dask are not installed in this environment, so
ref_driver.py installs THIS module as ``sys.modules["xarray"]`` in the
reference subprocess; that lets the reference's own zarr code execute
unmodified against this repo's zarrlite-format fixture stores, and
tests/test_reference_parity_zarr.py + test_reference_parity_preprocess.py
diff its outputs against ours bit-for-bit.

This is harness infrastructure, not part of the framework: it implements
exactly the xarray semantics the reference touches (attribute access to
variables/dim-coords, ``sel`` by coordinate value, ``isel`` by position,
``where``/``fillna``/``dropna``, flat ``argmin`` / per-dim ``argmax`` /
``max``, the ``.dt.year`` accessor, ``zeros_like``/``ones_like``/``where``
module functions, and ``Dataset.to_zarr`` with mode="w"/append_dim plus a
Blosc encoding) — everything eager numpy, nothing lazy.  If a semantic
here were wrong, the parity tests would diff, not silently pass: the
reference and our framework read the same stores through DIFFERENT
readers (this stub + zarrlite vs data/zarr_reader.py) and their outputs
are compared at the pixel level.
"""

import os
import sys

import numpy as np

# zarrlite import that works both when /root/repo is on sys.path and when
# this file is loaded standalone by ref_driver (which prepends the
# reference package dir, whose top-level names would otherwise shadow)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)
from crimac_unet_tpu.data import zarrlite  # noqa: E402


def _as_values(x):
    return x.values if isinstance(x, DataArray) else np.asarray(x)


def _null_mask(vals):
    """xarray treats NaN (float) AND NaT (datetime/timedelta) as null;
    returns None for dtypes with no null sentinel."""
    if np.issubdtype(vals.dtype, np.floating):
        return np.isnan(vals)
    if (np.issubdtype(vals.dtype, np.datetime64)
            or np.issubdtype(vals.dtype, np.timedelta64)):
        return np.isnat(vals)
    return None


def _skipna_argreduce(vals, which):
    """xarray's argmin/argmax default skipna=True: NaN/NaT positions must
    not win.  Returns an argmin/argmax callable for this dtype."""
    if np.issubdtype(vals.dtype, np.floating):
        return np.nanargmin if which == "min" else np.nanargmax
    if (np.issubdtype(vals.dtype, np.datetime64)
            or np.issubdtype(vals.dtype, np.timedelta64)):
        fill = (np.iinfo(np.int64).max if which == "min"
                else np.iinfo(np.int64).min)
        base = np.argmin if which == "min" else np.argmax

        def fn(v, axis=None):
            ints = np.where(np.isnat(v), fill, v.view("i8"))
            return base(ints, axis=axis)

        return fn
    return np.argmin if which == "min" else np.argmax


def _check_str_fit(stored_dtype, values, name):
    """Appending wider strings into a fixed-width array silently
    truncates in numpy; real xarray (vlen-utf8) never truncates — fail
    loudly instead."""
    stored = np.dtype(stored_dtype)
    if stored.kind not in ("U", "S"):
        return
    vals = np.asarray(values)
    width = stored.itemsize // (4 if stored.kind == "U" else 1)
    if vals.dtype.kind == stored.kind:
        need = vals.dtype.itemsize // (4 if vals.dtype.kind == "U" else 1)
        if need <= width or vals.size == 0:
            return
        longest = max(len(v) for v in vals.ravel().tolist())
    else:
        longest = max((len(str(v)) for v in vals.ravel().tolist()),
                      default=0)
    if longest > width:
        raise ValueError(
            f"appending to {name!r} would truncate strings: store width "
            f"{width}, incoming up to {longest} chars (real xarray "
            f"writes vlen strings and never truncates)")


class _DTAccessor:
    """The tiny slice of xarray's ``.dt`` accessor the reference uses
    (``int(ds.ping_time[0].dt.year)``, data_reader.py:538)."""

    def __init__(self, da):
        self._da = da

    @property
    def year(self):
        vals = self._da.values.astype("datetime64[Y]").astype(np.int64) \
            + 1970
        return DataArray(vals, dims=self._da.dims, coords=self._da.coords)


class DataArray:
    """Eager labeled array: numpy values + dim names + 1-D dim coords."""

    def __init__(self, data=None, dims=None, coords=None, name=None):
        self.values = _as_values(data)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self.values.ndim))
        self.dims = tuple(dims)
        if len(self.dims) != self.values.ndim:
            raise ValueError(f"dims {self.dims} do not match array of "
                             f"ndim {self.values.ndim}")
        self.coords = {}
        for k, v in dict(coords or {}).items():
            if k not in self.dims:
                raise ValueError(f"coord {k!r} is not a dim of {self.dims}")
            v = _as_values(v)
            if v.shape != (self.values.shape[self.dims.index(k)],):
                raise ValueError(f"coord {k!r} has shape {v.shape}")
            self.coords[k] = v
        self.name = name

    # -- numpy interop ---------------------------------------------------
    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.values, dtype=dtype)

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        """Keep numpy ufuncs (np.abs, np.power, comparisons with ndarray
        operands, ...) label-preserving, like xarray: compute on .values
        and re-wrap when the result keeps this array's shape."""
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        vals = [x.values if isinstance(x, DataArray) else x
                for x in inputs]
        result = ufunc(*vals, **kwargs)
        if isinstance(result, np.ndarray) and \
                result.shape == self.values.shape:
            return self._wrap(result)
        return result

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.values.shape))

    def __len__(self):
        return self.values.shape[0]

    def __int__(self):
        return int(self.values)

    def __float__(self):
        return float(self.values)

    def __repr__(self):
        return (f"<xrlite.DataArray {self.name or ''} {self.dims} "
                f"{self.values.shape} {self.values.dtype}>")

    # -- ops ---------------------------------------------------------------
    def _wrap(self, values, dims=None, coords=None):
        dims = self.dims if dims is None else dims
        if coords is None:
            coords = {k: v for k, v in self.coords.items() if k in dims}
        return DataArray(values, dims=dims, coords=coords, name=self.name)

    def _binop(self, other, op):
        if isinstance(other, DataArray) and other.dims != self.dims:
            # xarray aligns operands by DIM NAME, not position. Support
            # the subset/reorder case; anything else fails loudly rather
            # than silently broadcasting against the wrong axis.
            if not set(other.dims) <= set(self.dims):
                raise NotImplementedError(
                    f"xrlite binop alignment: other dims {other.dims} "
                    f"not a subset of {self.dims}")
            order = [d for d in self.dims if d in other.dims]
            aligned = np.transpose(other.values,
                                   [other.dims.index(d) for d in order])
            aligned = aligned[tuple(slice(None) if d in other.dims
                                    else None for d in self.dims)]
            return self._wrap(op(self.values, aligned))
        return self._wrap(op(self.values, _as_values(other)))

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __eq__(self, o):  # noqa: D105 — element-wise, like xarray
        return self._binop(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._binop(o, lambda a, b: a != b)

    def __le__(self, o):
        return self._binop(o, lambda a, b: a <= b)

    def __lt__(self, o):
        return self._binop(o, lambda a, b: a < b)

    def __ge__(self, o):
        return self._binop(o, lambda a, b: a >= b)

    def __gt__(self, o):
        return self._binop(o, lambda a, b: a > b)

    def __abs__(self):
        return self._wrap(np.abs(self.values))

    def __neg__(self):
        return self._wrap(-self.values)

    __hash__ = None

    # -- indexing ----------------------------------------------------------
    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        values = self.values[key]
        dims, coords = [], {}
        ki = 0
        for d in self.dims:
            if ki >= len(key):
                dims.append(d)
                if d in self.coords:
                    coords[d] = self.coords[d]
                continue
            k = key[ki]
            ki += 1
            if isinstance(k, (int, np.integer)):
                continue  # dim dropped
            dims.append(d)
            if d in self.coords:
                coords[d] = self.coords[d][k]
        return DataArray(values, dims=dims, coords=coords, name=self.name)

    def isel(self, **indexers):
        key = []
        for d in self.dims:
            key.append(indexers.pop(d, slice(None)))
        if indexers:
            raise ValueError(f"isel on unknown dims: {sorted(indexers)}")
        return self[tuple(key)]

    def sel(self, **indexers):
        out = self
        for dim, want in indexers.items():
            if dim not in out.coords:
                raise KeyError(f"no coord for dim {dim!r}")
            coord = out.coords[dim]
            scalar = not (isinstance(want, (list, tuple, np.ndarray,
                                            DataArray)))
            want_vals = np.atleast_1d(_as_values(want))
            idx = []
            for w in want_vals:
                hits = np.nonzero(coord == w)[0]
                if hits.size == 0:
                    raise KeyError(f"value {w!r} not found in coord "
                                   f"{dim!r}")
                idx.extend(int(h) for h in hits)
            axis = out.dims.index(dim)
            if scalar and len(idx) == 1:
                out = out[(slice(None),) * axis + (idx[0],)]
            else:
                # non-unique index: xarray returns ALL matches (the dim
                # is kept), it does not silently pick the first
                out = out[(slice(None),) * axis + (np.asarray(idx),)]
        return out

    @property
    def T(self):
        return DataArray(
            self.values.T, dims=self.dims[::-1],
            coords=self.coords, name=self.name)

    # -- methods -----------------------------------------------------------
    def astype(self, dtype):
        return self._wrap(self.values.astype(dtype))

    def fillna(self, value):
        vals = self.values
        null = _null_mask(vals)
        if null is not None:
            vals = np.where(null, value, vals)
        return self._wrap(vals)

    def isnull(self):
        null = _null_mask(self.values)
        if null is None:
            null = np.zeros(self.values.shape, bool)
        return self._wrap(null)

    def where(self, cond, other=np.nan):
        """Keep self where ``cond``; fill with ``other`` elsewhere
        (xarray semantics: condition TRUE keeps the original value)."""
        return self._wrap(np.where(_as_values(cond), self.values,
                                   _as_values(other)))

    def dropna(self, dim, how="any"):
        axis = self.dims.index(dim)
        vals = self.values
        nan = _null_mask(vals)
        if nan is None:
            return self
        other_axes = tuple(i for i in range(vals.ndim) if i != axis)
        bad = nan.any(axis=other_axes) if how == "any" else \
            nan.all(axis=other_axes)
        keep = np.nonzero(~bad)[0]
        return self[(slice(None),) * axis + (keep,)]

    def argmin(self, dim=None):
        fn = _skipna_argreduce(self.values, "min")
        if dim is None:
            return DataArray(fn(self.values), dims=())
        return self._reduce(dim, fn)

    def argmax(self, dim=None):
        fn = _skipna_argreduce(self.values, "max")
        if dim is None:
            return DataArray(fn(self.values), dims=())
        return self._reduce(dim, fn)

    def _reduce(self, dim, fn):
        axis = self.dims.index(dim)
        vals = fn(self.values, axis=axis)
        dims = tuple(d for d in self.dims if d != dim)
        coords = {k: v for k, v in self.coords.items() if k != dim}
        return DataArray(vals, dims=dims, coords=coords, name=self.name)

    def max(self, dim=None):
        """xarray default skipna=True for float data."""
        fn = np.nanmax if np.issubdtype(self.values.dtype, np.floating) \
            else np.max
        if dim is None:
            return DataArray(fn(self.values), dims=())
        return self._reduce(dim, fn)

    def min(self, dim=None):
        fn = np.nanmin if np.issubdtype(self.values.dtype, np.floating) \
            else np.min
        if dim is None:
            return DataArray(fn(self.values), dims=())
        return self._reduce(dim, fn)

    @property
    def dt(self):
        return _DTAccessor(self)


class Dataset:
    """Eager dataset: named DataArrays + dim coords + attrs."""

    def __init__(self, data_vars=None, coords=None, attrs=None):
        object.__setattr__(self, "_vars", {})
        object.__setattr__(self, "_coords", {})
        object.__setattr__(self, "attrs", dict(attrs or {}))
        object.__setattr__(self, "_chunk_spec", None)
        for name, da in dict(data_vars or {}).items():
            da = self._coerce(name, da)
            self._vars[name] = da
            for cname, cvals in da.coords.items():
                self._coords[cname] = DataArray(cvals, dims=(cname,),
                                                name=cname)
        for name, cv in dict(coords or {}).items():
            # xarray accepts (dims, values) tuples and plain vectors;
            # non-dim coords (e.g. raw_file over ping_time) keep their
            # own dims
            self._coords[name] = self._coerce(name, cv)

    @staticmethod
    def _coerce(name, v):
        if isinstance(v, DataArray):
            return v
        if isinstance(v, tuple) and len(v) == 2 and \
                isinstance(v[0], (list, tuple)):
            dims, vals = v
            return DataArray(_as_values(vals), dims=tuple(dims), name=name)
        return DataArray(_as_values(v), dims=(name,), name=name)

    # -- access ------------------------------------------------------------
    def __getattr__(self, name):
        try:
            return self.get_required(name)
        except KeyError:
            raise AttributeError(name)

    def get_required(self, name):
        if name in self._vars:
            return self._attach_coords(self._vars[name])
        if name in self._coords:
            return self._coords[name]
        raise KeyError(name)

    def get(self, name, default=None):
        try:
            return self.get_required(name)
        except KeyError:
            return default

    def __getitem__(self, name):
        return self.get_required(name)

    def __contains__(self, name):
        return name in self._vars or name in self._coords

    def _attach_coords(self, da):
        coords = dict(da.coords)
        for d in da.dims:
            if d not in coords and d in self._coords:
                coords[d] = self._coords[d].values
        return DataArray(da.values, dims=da.dims, coords=coords,
                         name=da.name)

    @property
    def data_vars(self):
        return {k: self._attach_coords(v) for k, v in self._vars.items()}

    @property
    def sizes(self):
        out = {}
        for da in list(self._vars.values()) + list(self._coords.values()):
            for d, s in zip(da.dims, da.values.shape):
                if d in out and out[d] != s:
                    raise ValueError(f"inconsistent size for dim {d!r}")
                out[d] = s
        return out

    @property
    def dims(self):
        return self.sizes

    # -- transforms ----------------------------------------------------------
    def astype(self, dtype):
        ds = Dataset({k: v.astype(dtype) for k, v in self._vars.items()},
                     attrs=self.attrs)
        ds._coords.update(self._coords)
        ds._chunk_spec = self._chunk_spec
        return ds

    def chunk(self, spec=None, **kw):
        # xarray MERGES with existing chunking — dims not named keep
        # their earlier spec (the reference chunks {freq:1,...} in the
        # converter then {'range':..., 'ping_time':'auto'} at append)
        merged = dict(self._chunk_spec or {})
        merged.update(dict(spec or {}))
        merged.update(kw)
        ds = Dataset(dict(self._vars), attrs=self.attrs)
        ds._coords.update(self._coords)
        ds._chunk_spec = merged
        return ds

    # -- zarr io ---------------------------------------------------------
    def _chunks_for(self, da):
        spec = self._chunk_spec or {}
        chunks = []
        for d, s in zip(da.dims, da.values.shape):
            c = spec.get(d)
            if c in (None, "auto"):
                # dask "auto" targets ~100 MB blocks; for the fixture-scale
                # stores this harness writes, cap at the reference's
                # 1000-ping production chunking (save_predict.py:126)
                c = min(s, 1000) if c == "auto" else s
            elif int(c) < 0:
                c = s  # -1 is the dask/xarray "whole dimension" idiom
            chunks.append(max(1, min(int(c), s)) if s else 1)
        return tuple(chunks)

    def to_zarr(self, store, mode=None, encoding=None, append_dim=None):
        if append_dim is not None:
            group = zarrlite.ZGroup.open(str(store))
            for name, da in self._vars.items():
                axis = da.dims.index(append_dim)
                _check_str_fit(group[name].dtype, da.values, name)
                group[name].append(da.values, axis=axis)
            for name, cda in self._coords.items():
                if append_dim in cda.dims:
                    _check_str_fit(group[name].dtype, cda.values, name)
                    group[name].append(cda.values,
                                       axis=cda.dims.index(append_dim))
            return
        if mode != "w":
            raise NotImplementedError("xrlite.to_zarr supports mode='w' "
                                      "or append_dim only")
        group = zarrlite.ZGroup.create(str(store), attrs=self.attrs,
                                       overwrite=True)
        encoding = encoding or {}
        for name, da in self._vars.items():
            comp = _translate_compressor(
                encoding.get(name, {}).get("compressor"))
            arr = group.create_array(
                name, da.values.shape, self._chunks_for(da),
                _widen_str(da.values.dtype),
                fill_value=(np.nan if np.issubdtype(da.values.dtype,
                                                    np.floating) else 0),
                dims=list(da.dims), compressor=comp)
            arr[(slice(None),) * da.values.ndim] = da.values
        for name, cda in self._coords.items():
            arr = group.create_array(
                name, cda.values.shape, cda.values.shape,
                _widen_str(cda.values.dtype), fill_value=None,
                dims=list(cda.dims), compressor=None)
            arr[(slice(None),) * cda.values.ndim] = cda.values


def _widen_str(dtype):
    """Fixed-width string arrays are sized to the FIRST write in raw
    zarr, but real xarray writes vlen strings that fit anything — widen
    to >=64 chars (the framework's |S64 reader convention) so a later
    append with longer echogram names cannot truncate (appends also
    guard via _check_str_fit)."""
    dtype = np.dtype(dtype)
    if dtype.kind in ("U", "S"):
        unit = 4 if dtype.kind == "U" else 1
        width = max(64, dtype.itemsize // unit)
        return np.dtype(f"{dtype.kind}{width}")
    return dtype


def _translate_compressor(comp):
    """numcodecs.Blosc stub (cname/clevel/shuffle attrs) -> zarrlite spec."""
    if comp is None:
        return None
    if all(hasattr(comp, a) for a in ("cname", "clevel", "shuffle")):
        return {"id": "blosc", "cname": str(comp.cname),
                "clevel": int(comp.clevel), "shuffle": int(comp.shuffle),
                "blocksize": 0}
    raise ValueError(f"unsupported compressor {comp!r}")


def open_zarr(path, **kw):
    group = zarrlite.ZGroup.open(str(path))
    data_vars, coords = {}, {}
    for name in group.array_names():
        arr = group[name]
        dims = arr.dims or [f"dim_{i}" for i in range(arr.ndim)]
        values = arr[(slice(None),) * arr.ndim]
        da = DataArray(values, dims=dims, name=name)
        # dimension coordinate: 1-D array named after its own dim
        if len(dims) == 1 and dims[0] == name:
            coords[name] = values
        else:
            data_vars[name] = da
    ds = Dataset(data_vars, coords=coords, attrs=dict(group.attrs))
    return ds


def zeros_like(da):
    return DataArray(np.zeros_like(da.values), dims=da.dims,
                     coords=da.coords, name=da.name)


def ones_like(da):
    return DataArray(np.ones_like(da.values), dims=da.dims,
                     coords=da.coords, name=da.name)


def where(cond, x, y):
    vals = np.where(_as_values(cond), _as_values(x), _as_values(y))
    template = next((v for v in (cond, x, y) if isinstance(v, DataArray)),
                    None)
    if template is not None and vals.shape == template.values.shape:
        return DataArray(vals, dims=template.dims, coords=template.coords)
    return DataArray(vals)
