"""Property-based tests (hypothesis): storage + codec + grid invariants.

The reference has no automated tests at all (SURVEY.md §4); beyond the
oracle-parity suites, these pin the algebraic contracts under randomized
inputs: zarrlite region reads/writes/appends against an in-memory numpy
oracle for every codec, blosc roundtrips across dtypes/shuffles, and the
sliding-window grid's exactly-once interior coverage (the invariant the
overlap-trim stitching relies on, reference mask_label_overlap.py:41-47 +
fill_out_array save_predict.py:43-45).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from crimac_unet_tpu.data import blosc_codec as bc
from crimac_unet_tpu.data.zarrlite import ZArray

_CODECS = [None, "zlib"] + (["blosc", "blosc-zstd"] if bc.available()
                            else [])


@st.composite
def _array_and_ops(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    ch = draw(st.integers(1, 17))
    cw = draw(st.integers(1, 17))
    dtype = draw(st.sampled_from([np.float32, np.float16, np.int32]))
    comp = draw(st.sampled_from(_CODECS))
    seed = draw(st.integers(0, 2 ** 16))
    n_ops = draw(st.integers(1, 4))
    return h, w, ch, cw, dtype, comp, seed, n_ops


@settings(max_examples=30, deadline=None)
@given(_array_and_ops())
def test_zarrlite_matches_numpy_oracle(tmp_path_factory, spec):
    """Random region writes + appends + reads on a zarrlite array equal
    the same operations on a plain numpy array, for every codec."""
    h, w, ch, cw, dtype, comp, seed, n_ops = spec
    rng = np.random.RandomState(seed)
    tmp = tmp_path_factory.mktemp("prop")
    ref = rng.rand(h, w).astype(dtype)
    arr = ZArray.create(tmp / "a.zarr", (h, w), (ch, cw), dtype,
                        compressor=comp, fill_value=0, overwrite=True)
    arr[:] = ref

    for _ in range(n_ops):
        op = rng.randint(3)
        if op == 0:  # region write
            y0 = rng.randint(0, h)
            x0 = rng.randint(0, ref.shape[1])
            y1 = rng.randint(y0 + 1, h + 1)
            x1 = rng.randint(x0 + 1, ref.shape[1] + 1)
            block = rng.rand(y1 - y0, x1 - x0).astype(dtype)
            arr[y0:y1, x0:x1] = block
            ref[y0:y1, x0:x1] = block
        elif op == 1:  # append along axis 1
            extra = rng.rand(h, rng.randint(1, 9)).astype(dtype)
            arr.append(extra, axis=1)
            ref = np.concatenate([ref, extra], axis=1)
        else:  # random region read check
            y0 = rng.randint(0, h)
            x0 = rng.randint(0, ref.shape[1])
            np.testing.assert_array_equal(arr[y0:, x0:], ref[y0:, x0:])
    np.testing.assert_array_equal(arr[:], ref)
    assert arr.shape == ref.shape


@pytest.mark.skipif(not bc.available(), reason="no blosc backend")
@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=50000),
       st.sampled_from([1, 2, 4, 8]),
       st.integers(0, 2),
       st.sampled_from(["zstd", "lz4", "zlib", "blosclz"]),
       st.integers(1, 9))
def test_blosc_roundtrip_property(raw, typesize, shuffle, cname, clevel):
    frame = bc.compress(raw, typesize, clevel, shuffle, cname)
    assert bc.decompress(frame) == raw
    hdr = bc.parse_header(frame)
    if hdr["memcpyed"] or hdr["codec"] in ("lz4", "zlib"):
        assert bc._pure_decompress(frame) == raw


@settings(max_examples=60, deadline=None)
@given(st.integers(32, 512),        # extent along one axis
       st.integers(8, 64),          # window
       st.integers(0, 15),          # overlap (< window/2)
       st.integers(0, 300))         # start offset
def test_grid_interiors_tile_exactly_once(extent, window, overlap, start):
    """Every pixel of [start, start+extent) is owned by exactly one patch
    interior (patch minus the overlap frame) under the reference grid
    (gridded.py:40-47 stride = window - 2*overlap) — the invariant that
    makes reshape-stitching equal per-patch scatter."""
    from crimac_unet_tpu.ops.patches import grid_dims, make_grid_starts

    if 2 * overlap >= window:
        return
    stride = window - 2 * overlap
    n = grid_dims(start, start + extent, window, overlap)
    y0s, x0s = make_grid_starts(n, 1, stride, stride, overlap, overlap,
                                overlap)
    counts = np.zeros(n * stride, dtype=int)
    for k in range(n):
        interior0 = k * stride
        counts[interior0:interior0 + stride] += 1
    assert (counts == 1).all()
    # the grid covers at least the requested extent
    assert n * stride >= extent


def test_crop_origin_convention_consistent_across_paths():
    """Every crop implementation (memmap crop_bounds, zarr crops, seabed
    row helper, the device-pool gather, and the stitching inverse) must
    share ONE origin convention for BOTH window parities — an r3 review
    pass found the odd-window fix applied to crop_bounds alone, shifting
    sibling paths one pixel apart."""
    from crimac_unet_tpu.utils.grids import (crop_bounds,
                                             patch_coord_to_data_coord)
    for N in (4, 5, 32, 33):
        center = np.array([50, 60])
        win = np.array([N, N])
        ul, lr = crop_bounds(center, win)
        expect = center - (N + 1) // 2 + 1
        assert (ul == expect).all()
        # stitching inverse: patch (0,0) maps back to the crop origin
        back = patch_coord_to_data_coord(np.array([[0, 0]]), center, win)
        assert (back[0] == ul).all(), N
        # zarr crop origin (crop_data source) — same formula inline
        y0 = int(center[0]) - (win[0] + 1) // 2 + 1
        assert y0 == ul[0]
        # the predict/eval meta-center inverse (inference.grid_center_cols)
        # must round-trip through crop_bounds for both parities
        from crimac_unet_tpu.pipeline.inference import grid_center_cols
        cx = grid_center_cols(np.array([ul[1]]), N)
        assert cx[0] == center[1], N


def test_crop_bounds_matches_reference_getgrid_offsets():
    """crop_bounds must cover the reference getGrid offsets
    linspace(-((N+1)//2)+1, N//2, N) for BOTH parities — N//2 alone
    shifted odd windows one pixel down-right (review finding r3)."""
    from crimac_unet_tpu.utils.grids import crop_bounds
    for N in (2, 4, 5, 7, 32, 255, 256):
        offsets = np.linspace(-((N + 1) // 2) + 1, N // 2, N).astype(int)
        ul, lr = crop_bounds(np.array([100, 50]), np.array([N, N]))
        assert ul[0] == 100 + offsets[0], N
        assert lr[0] == 100 + offsets[-1] + 1, N


@settings(max_examples=200, deadline=None)
@given(st.integers(695000, 745000),                 # ordinals ~1903-2040
       st.floats(0.0, 1.0, exclude_max=True),
       st.sampled_from([0.0, 0.5e-6 / 86400.0]))   # half-us tie nudges
def test_matlab_time_matches_reference_timedelta_law(day, frac, nudge):
    """matlab_time_to_datetime64 must reproduce the reference's
    per-scalar datetime.fromordinal + timedelta(days=frac) arithmetic
    (memmap_to_zarr.py:29-31) BIT-exactly — including timedelta's
    round-half-even microsecond quantization, probed here with exact
    half-microsecond ties."""
    from datetime import datetime, timedelta

    from crimac_unet_tpu.data.preprocess import matlab_time_to_datetime64

    t = float(day) + min(frac + nudge, np.nextafter(1.0, 0.0))
    want = np.datetime64(
        datetime.fromordinal(int(t)) + timedelta(days=t % 1)
        - timedelta(days=366)).astype("datetime64[ns]")
    got = matlab_time_to_datetime64([t])[0]
    assert got == want, (t, got, want)
