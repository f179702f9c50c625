"""End-to-end parity of the TPU predict path vs a numpy oracle implementing
the reference's per-patch pipeline (crop -> transform chain -> forward ->
fill_out_array scatter, save_predict.py:41-219)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from crimac_unet_tpu.constants import (LABEL_BOUNDARY_VAL, LABEL_IGNORE_VAL,
                                       LABEL_OVERLAP_VAL,
                                       LABEL_REFINE_BOUNDARY_VAL,
                                       LABEL_SEABED_MASK_VAL,
                                       LABEL_UNUSED_SPECIES)
from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import UNet
from crimac_unet_tpu.ops.morphology import DISC_7X7
from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                predict_reader)
from crimac_unet_tpu.utils.preload_split import get_data_split

WH = WW = 32
OVERLAP = 4
PRELOAD = 80


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("parity")
    sv = make_zarr_survey(path, year=2017, n_echograms=2, H=60, W=150,
                          seed=11, n_schools=4, unused_species=True)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, WH, WW, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    config = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
              "frequencies": [18, 38, 120, 200], "fwd_batch": 8}
    runner = GriddedRunner(model, variables, config)

    def forward_single(patch_chw):
        out = model.apply(variables, jnp.asarray(
            patch_chw.transpose(1, 2, 0))[None], train=False)
        return np.asarray(jax.nn.softmax(out, axis=-1))[0]  # (H, W, 3)

    return reader, runner, forward_single


# ---------------------------------------------------------- numpy oracle
def _oracle_convert_unused(labels):
    new = np.full(labels.shape, LABEL_IGNORE_VAL, dtype=np.float64)
    new[labels == 0] = 0
    new[labels == 27] = 1
    new[labels == 1] = 2
    new[(labels > 0) & (labels != 1) & (labels != 27)] = LABEL_UNUSED_SPECIES
    return new


def _oracle_refine(data, labels):
    d = data[-1]
    new = labels.copy()
    idxs = np.argwhere(new != LABEL_BOUNDARY_VAL)
    if len(idxs) == 0:
        return new
    y0, x0 = idxs.min(axis=0)
    y1, x1 = idxs.max(axis=0) + 1
    relevant = new[y0:y1, x0:x1]
    mask_thr = (labels > 0) & (d > 1e-7) & (d < 1e-4)
    closed = ndi.binary_closing(mask_thr[y0:y1, x0:x1],
                                structure=DISC_7X7.astype(bool))
    mask = np.zeros_like(new, dtype=bool)
    mask[y0:y1, x0:x1] = (closed == 0) & (relevant > 0)
    new[mask] = LABEL_REFINE_BOUNDARY_VAL
    new[labels == LABEL_IGNORE_VAL] = LABEL_IGNORE_VAL
    return new


def _oracle_mask_seabed(labels, reader, center):
    """reference mask_label_seabed.py:35-68 for a zarr reader."""
    wh, ww = labels.shape
    y_upper = center[0] - wh // 2 + 1
    x_left = center[1] - ww // 2 + 1
    y_lower, x_right = y_upper + wh, x_left + ww
    n_pings, n_range = reader.shape

    sx0, sy0 = max(x_left, 0), max(y_upper, 0)
    sx1, sy1 = min(x_right, n_pings), min(y_lower, n_range)

    mask = reader.get_seabed_mask(sx0, sx1 - sx0, sy0, sy1 - sy0,
                                  seabed_pad=10).T  # -> (range, ping)
    padded = np.zeros_like(labels)
    padded[sy0 - y_upper:sy0 - y_upper + mask.shape[0],
           sx0 - x_left:sx0 - x_left + mask.shape[1]] = mask
    out = labels.copy()
    out[(padded.astype(bool)) & (labels == 0)] = LABEL_SEABED_MASK_VAL
    return out


def _oracle_mask_overlap(labels, overlap):
    if overlap == 0:
        return labels
    out = np.full_like(labels, LABEL_OVERLAP_VAL)
    out[overlap:-overlap, overlap:-overlap] = \
        labels[overlap:-overlap, overlap:-overlap]
    out[labels == LABEL_BOUNDARY_VAL] = LABEL_BOUNDARY_VAL
    return out


def _oracle_predict_chunk(reader, forward_single, s, e, frequencies):
    """Reference save_survey_predictions_zarr inner loop
    (save_predict.py:171-211) with preload crops
    (dataset.py:164-205)."""
    n_pings, n_range = reader.shape
    w = e - s
    sb = np.asarray(reader.get_seabed(s, w))
    end_range = int(min(sb.max() + 50, n_range))

    # grid centers (gridded.py:40-53)
    ys_ul = np.arange(0 - (OVERLAP + 1), end_range - (OVERLAP + 1),
                      WH - 2 * OVERLAP)
    xs_ul = np.arange(s - (OVERLAP + 1), e - (OVERLAP + 1),
                      WW - 2 * OVERLAP)
    ys_c, xs_c = ys_ul + WH // 2, xs_ul + WW // 2

    # preload slabs (dataset.py:164-184)
    label_slab = reader.get_label_slice(s, w).T      # (range, ping-chunk)
    label_slab = label_slab.astype(np.float64)
    d_x0 = max(0, int(xs_c[0]) - WW // 2)
    d_x1 = min(n_pings, int(xs_c[-1]) + WW // 2)
    data_slab = reader.get_data_slice(d_x0, d_x1 - d_x0,
                                      frequencies=frequencies)
    data_slab = data_slab.swapaxes(1, 2)             # (C, range, ping)

    out = np.zeros((2, n_range, w), np.float32)
    for yc in ys_c:
        for xc in xs_c:
            # new_get_crop with boundary fill (utils/np.py:347-375)
            def crop2(arr, cy, cx, fill):
                res = np.full((WH, WW), fill, np.float64)
                ay0, ax0 = cy - WH // 2 + 1, cx - WW // 2 + 1
                by0, bx0 = max(ay0, 0), max(ax0, 0)
                by1 = min(ay0 + WH, arr.shape[0])
                bx1 = min(ax0 + WW, arr.shape[1])
                if by1 > by0 and bx1 > bx0:
                    res[by0 - ay0:by1 - ay0, bx0 - ax0:bx1 - ax0] = \
                        arr[by0:by1, bx0:bx1]
                return res

            labels = crop2(label_slab, yc, xc - s, LABEL_BOUNDARY_VAL)
            data = np.stack([crop2(data_slab[c], yc, xc - d_x0, 0.0)
                             for c in range(data_slab.shape[0])])

            # label chain 'all' (transforms.py:78-92)
            lab = _oracle_convert_unused(labels)
            lab = _oracle_refine(data, lab)
            lab = _oracle_mask_seabed(lab, reader, [yc, xc])
            lab = _oracle_mask_overlap(lab, OVERLAP)

            # data chain (transforms.py:48-54; zarr predict has no border
            # zeroing)
            lab[~np.isfinite(data[0])] = LABEL_IGNORE_VAL
            d = np.where(np.isfinite(data), data, 0.0)
            d = np.clip(10 * np.log10(d + 1e-10), -75, 0)

            probs = forward_single(d.astype(np.float32))  # (WH, WW, 3)

            # fill_out_array (save_predict.py:41-65)
            sel = np.argwhere((lab != LABEL_OVERLAP_VAL)
                              & (lab != LABEL_SEABED_MASK_VAL)
                              & (lab != LABEL_BOUNDARY_VAL))
            if len(sel) == 0:
                continue
            yl, xl = sel.T
            ya = yl + yc - WH // 2 + 1
            xa = xl + xc - WW // 2 + 1 - s
            ok = (ya >= 0) & (ya < n_range) & (xa >= 0) & (xa < w)
            out[0, ya[ok], xa[ok]] = probs[yl[ok], xl[ok], 1]
            out[1, ya[ok], xa[ok]] = probs[yl[ok], xl[ok], 2]
    return out


def test_predict_parity_with_reference_oracle(setup):
    reader, runner, forward_single = setup
    n_pings = reader.shape[0]
    splits = get_data_split([[0, n_pings]], PRELOAD)

    got_chunks = {s: out for s, e, out, _ in
                  predict_reader(runner, reader, PRELOAD)}
    assert len(got_chunks) == len(splits)

    for (s, e) in splits:
        want = _oracle_predict_chunk(reader, forward_single, int(s), int(e),
                                     runner.frequencies)
        got = got_chunks[int(s)].astype(np.float32)
        mismatch = np.abs(got - want.astype(np.float16).astype(np.float32))
        assert mismatch.max() < 2e-3, (
            f"chunk {s}:{e} max dev {mismatch.max()} at "
            f"{np.unravel_index(mismatch.argmax(), mismatch.shape)}")
        # zero/nonzero pattern (the masks) must agree exactly
        np.testing.assert_array_equal(got != 0, want != 0,
                                      err_msg=f"mask mismatch chunk {s}")


def test_unpack_bits_inverts_packbits():
    """_unpack_bits is the exact device-side inverse of
    np.packbits(mask, axis=1) for every width mod 8, so the packed label
    predicates reproduce the full-label write mask bit-for-bit."""
    from crimac_unet_tpu.pipeline.inference import _unpack_bits

    rng = np.random.default_rng(7)
    for W in (1, 7, 8, 9, 40, 1000):
        mask = rng.random((13, W)) < 0.4
        packed = np.packbits(mask, axis=1)
        out = np.asarray(_unpack_bits(jnp.asarray(packed), W))
        np.testing.assert_array_equal(out, mask)


def test_sub_batch_shape_minimizes_padding():
    """B/Np/nb choice: padding minimized at 8-patch granularity (measured
    faster than exact-fit off-multiple batches on v5e); mesh granularity
    honored on a mesh."""
    from crimac_unet_tpu.pipeline.inference import GriddedRunner

    r = GriddedRunner.__new__(GriddedRunner)
    r.mesh = None
    r.fwd_batch = 32
    assert r._sub_batch_shape(25) == (32, 32, 1)
    assert r._sub_batch_shape(32) == (32, 32, 1)
    assert r._sub_batch_shape(33) == (24, 48, 2)     # 15 pad, not 31
    assert r._sub_batch_shape(100) == (32, 128, 4)
    assert r._sub_batch_shape(1) == (8, 8, 1)
    # fwd_batch is a hard cap (activation-memory bound): the 8-rounding
    # must not exceed it
    r.fwd_batch = 4
    assert r._sub_batch_shape(8) == (4, 8, 2)
    r.fwd_batch = 20
    assert r._sub_batch_shape(40) == (20, 40, 2)
    r.fwd_batch = 32

    class FakeMesh:
        class devices:
            @staticmethod
            def ravel():
                return [None] * 8
    r.mesh = FakeMesh()
    B, Np, nb = r._sub_batch_shape(25)
    assert B % 8 == 0 and Np == nb * B and Np >= 25


def test_slab_infer_mode_matches_patch_interior(tmp_path):
    """infer_mode='slab' (fully-convolutional whole-chunk forward) agrees
    with the default patch-window mode wherever patch zero-padding cannot
    reach: pixels farther than the receptive field from every patch data
    border and from the survey edges.  Near-border divergence is the
    documented (and intended) difference — slab mode sees real data where
    patch mode saw artificial zeros."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    sv = make_zarr_survey(tmp_path, year=2022, n_echograms=1, H=200,
                          W=220, seed=17)
    reader = DataReaderZarr(sv)
    cfg = {"patch_size": [64, 64], "patch_overlap": 8,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 16,
           "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 4)),
                   train=False)
    out = {}
    for mode in ("patch", "slab"):
        runner = GriddedRunner(model, v, dict(cfg, infer_mode=mode))
        s, e, pred, _ = next(iter(predict_reader(runner, reader, 220)))
        out[mode] = np.asarray(pred, np.float32)

    assert out["patch"].shape == out["slab"].shape
    # identical write masks: the mask inputs are mode-independent
    np.testing.assert_array_equal(out["patch"] == 0, out["slab"] == 0)

    # interior selection: >= 16 px (> receptive field of the depth-2 net)
    # from every patch data border, and >= 32 px from survey edges
    sh = sw = 64 - 2 * 8
    H, W = out["patch"].shape[1:]
    ys = np.arange(H)
    xs = np.arange(W)
    yd = np.minimum((ys % sh) + 8, sh - 1 - (ys % sh) + 8)
    xd = np.minimum((xs % sw) + 8, sw - 1 - (xs % sw) + 8)
    sel_y = (yd >= 16) & (ys >= 32) & (ys < H - 32)
    sel_x = (xd >= 16) & (xs >= 32) & (xs < W - 32)
    interior = np.ix_([0, 1], np.where(sel_y)[0], np.where(sel_x)[0])
    a, b = out["patch"][interior], out["slab"][interior]
    assert a.size > 500, "selection too small to be meaningful"
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_slab_infer_mode_misaligned_geometry(tmp_path):
    """With stride/overlap NOT multiples of 2**(depth-1) (e.g. the
    baseline geometry: stride 216, overlap 20, alignment 16), the slab
    forward's pooling grid is misaligned with every patch's pooling
    grid, so slab outputs diverge (slightly) from patch mode at every
    pixel — not just near patch borders.  GriddedRunner warns at
    construction; masks stay bit-identical; the probability divergence
    stays small (advisor finding r2)."""
    import warnings

    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    sv = make_zarr_survey(tmp_path, year=2022, n_echograms=1, H=200,
                          W=220, seed=23)
    reader = DataReaderZarr(sv)
    # depth 3 -> alignment 4; overlap 10 -> stride 44 (44%4==0, 10%4==2):
    # misaligned, same failure class as the baseline geometry
    cfg = {"patch_size": [64, 64], "patch_overlap": 10,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 16,
           "depth": 3, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(11), jnp.zeros((1, 64, 64, 4)),
                   train=False)
    out = {}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for mode in ("patch", "slab"):
            runner = GriddedRunner(model, v, dict(cfg, infer_mode=mode))
            s, e, pred, _ = next(iter(predict_reader(runner, reader, 220)))
            out[mode] = np.asarray(pred, np.float32)
    msgs = [str(w.message) for w in rec]
    assert any("pooling grid is misaligned" in m for m in msgs), msgs
    # masks are mode-independent even when probabilities diverge
    np.testing.assert_array_equal(out["patch"] == 0, out["slab"] == 0)
    written = out["patch"] != 0
    assert written.any()
    diff = np.abs(out["patch"] - out["slab"])[written]
    # documented behavior: global, small divergence (not confined to
    # patch borders) — bound it loosely so regressions are visible
    assert diff.mean() < 0.05, diff.mean()
    assert diff.max() < 0.75, diff.max()


def _meta_flags(**on):
    flags = {"portion_year": False, "portion_day": False, "depth_rel": False,
             "depth_abs_surface": False, "depth_abs_seabed": False,
             "time_diff": False}
    flags.update(on)
    return flags


@pytest.mark.parametrize("late", [False, True])
def test_slab_infer_mode_meta_channels_interior_parity(tmp_path, late):
    """infer_mode='slab' supports metadata channels fully convolutionally
    (early concat AND the late per-pixel-MLP injection).  With the
    per-pixel families (portion_year, time_diff, depth_*) the meta values
    per survey pixel are IDENTICAL to patch mode, so interior pixels agree
    with patch mode exactly like the no-meta aligned-geometry case."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.meta_channels import get_in_channels
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=200, W=220,
                    seed=29)
    e = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                      minimum_shape=64)[0]
    meta = _meta_flags(portion_year=True, time_diff=True, depth_rel=True,
                       depth_abs_surface=True, depth_abs_seabed=True)
    cfg = {"patch_size": [64, 64], "patch_overlap": 8,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 16,
           "depth": 2, "start_filts": 4, "meta_channels": meta,
           "late_meta_inject": late}
    model = build_unet(cfg)
    M = get_in_channels(meta)
    if late:
        v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 4)),
                       meta=jnp.zeros((1, 64, 64, M)), train=False)
    else:
        v = model.init(jax.random.PRNGKey(5),
                       jnp.zeros((1, 64, 64, 4 + M)), train=False)
    out = {}
    for mode in ("patch", "slab"):
        runner = GriddedRunner(model, v, dict(cfg, infer_mode=mode))
        s, e2, pred, _ = next(iter(predict_reader(runner, e, 220)))
        out[mode] = np.asarray(pred, np.float32)

    np.testing.assert_array_equal(out["patch"] == 0, out["slab"] == 0)
    assert (out["slab"] > 0).any()
    # interior selection as in test_slab_infer_mode_matches_patch_interior
    sh = sw = 64 - 2 * 8
    H, W = out["patch"].shape[1:]
    ys, xs = np.arange(H), np.arange(W)
    yd = np.minimum((ys % sh) + 8, sh - 1 - (ys % sh) + 8)
    xd = np.minimum((xs % sw) + 8, sw - 1 - (xs % sw) + 8)
    sel_y = (yd >= 16) & (ys >= 32) & (ys < H - 32)
    sel_x = (xd >= 16) & (xs >= 32) & (xs < W - 32)
    interior = np.ix_([0, 1], np.where(sel_y)[0], np.where(sel_x)[0])
    a, b = out["patch"][interior], out["slab"][interior]
    assert a.size > 500, "selection too small to be meaningful"
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_slab_infer_mode_portion_day_bounded_divergence(tmp_path):
    """With portion_day enabled, slab mode evaluates each column's own
    time-of-day instead of the owning patch center's (documented
    divergence): outputs stay close, masks bit-identical."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.meta_channels import get_in_channels
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=160, W=200,
                    seed=31)
    e = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                      minimum_shape=64)[0]
    meta = _meta_flags(portion_year=True, portion_day=True, time_diff=True)
    cfg = {"patch_size": [64, 64], "patch_overlap": 8,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 16,
           "depth": 2, "start_filts": 4, "meta_channels": meta}
    model = build_unet(cfg)
    M = get_in_channels(meta)
    v = model.init(jax.random.PRNGKey(13), jnp.zeros((1, 64, 64, 4 + M)),
                   train=False)
    out = {}
    for mode in ("patch", "slab"):
        runner = GriddedRunner(model, v, dict(cfg, infer_mode=mode))
        s, e2, pred, _ = next(iter(predict_reader(runner, e, 200)))
        out[mode] = np.asarray(pred, np.float32)
    np.testing.assert_array_equal(out["patch"] == 0, out["slab"] == 0)
    written = out["patch"] != 0
    assert written.any()
    diff = np.abs(out["patch"] - out["slab"])[written]
    assert np.isfinite(diff).all()
    # bounded, visible-on-regression divergence (fixture pings span
    # minutes, so the per-column vs patch-center portion_day gap is small)
    assert diff.mean() < 0.05, diff.mean()


def test_slab_infer_mode_memmap_border_zero(tmp_path):
    """Slab mode on the memmap format exercises the border-zeroing branch
    (memm test transform); masks must match patch mode exactly."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.models.unet import build_unet

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=150, W=180,
                    seed=19)
    e = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                      minimum_shape=64)[0]
    cfg = {"patch_size": [64, 64], "patch_overlap": 8,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 16,
           "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 4)),
                   train=False)
    out = {}
    for mode in ("patch", "slab"):
        runner = GriddedRunner(model, v, dict(cfg, infer_mode=mode))
        s, e2, pred, _ = next(iter(predict_reader(runner, e, 180)))
        out[mode] = np.asarray(pred, np.float32)
    np.testing.assert_array_equal(out["patch"] == 0, out["slab"] == 0)
    assert (out["slab"] > 0).any()


# ------------------------------------------------------------- static_grid
def _varying_seabed_survey(tmp_path, H=120, W=145, heights=None):
    """Two echograms with very different (pinned) seabed depths, so the
    per-chunk grid height R varies across the concatenated survey, plus a
    survey length that leaves a narrower tail chunk (C varies too).
    ``heights`` (optional pair) gives each echogram its own range extent —
    real memm surveys mix recording depths, and static_grid must not
    re-specialize any device program on the per-echogram n_range."""
    import os

    from crimac_unet_tpu.data.fixtures import (make_synthetic_echogram,
                                               write_memmap_echogram)
    from crimac_unet_tpu.data.memmap_reader import Echogram
    from crimac_unet_tpu.data.preprocess import echograms_to_zarr_survey

    rng = np.random.RandomState(7)
    dirs = []
    hs = heights or (H, H)
    for i, (frac, row) in enumerate(((0.3, 30), (0.85, 95))):
        H = hs[i]
        row = min(row, H - 20)
        data, labels, heave, _ = make_synthetic_echogram(
            H, W, rng, n_schools=3, seabed_frac=frac)
        name = f"2019843-D2019042{7 + i}-T06261{i}"
        d = write_memmap_echogram(tmp_path / "memm", name, data, labels,
                                  heave)
        # pin the seabed exactly (the estimator would land near the bright
        # line anyway; the test needs deterministic per-chunk grid heights)
        np.save(os.path.join(d, "seabed.npy"),
                np.full(W, row, dtype=np.int64))
        dirs.append(d)
    echs = [Echogram(d) for d in dirs]
    out = tmp_path / "zarr"
    echograms_to_zarr_survey(echs, str(out), "S2019843")
    return str(out / "S2019843_sv.zarr"), echs


@pytest.mark.parametrize("mode", ["patch", "slab"])
def test_static_grid_output_identical(tmp_path, mode):
    """static_grid=True compiles ONE program shape for every chunk (the
    survey-max grid height and full-chunk width) and must reproduce the
    per-chunk reference formulation EXACTLY: the pad rows/columns read
    zero/NaN fill, never real data, and the device row cutoff discards
    them, so live pixels see the same math on the same values."""
    from crimac_unet_tpu.models.unet import build_unet

    sv, _ = _varying_seabed_survey(tmp_path)
    reader = DataReaderZarr(sv)
    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4, "infer_mode": mode}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    def run(static):
        runner = GriddedRunner(model, v, dict(cfg, static_grid=static))
        seen = []
        if mode == "patch":
            real = runner._predict_patches

            def spy(variables, data_slab, y0s, x0s, border_slab, meta_slab,
                    consts, R, C, border_zero, use_meta=False):
                seen.append((R, C))
                return real(variables, data_slab, y0s, x0s, border_slab,
                            meta_slab, consts, R, C, border_zero, use_meta)
            runner._predict_patches = spy
        else:
            real = runner._predict_slab

            def spy(variables, data_slab, border_slab, meta_full, R, C,
                    border_zero, use_meta=False):
                seen.append((R, C))
                return real(variables, data_slab, border_slab, meta_full,
                            R, C, border_zero, use_meta)
            runner._predict_slab = spy
        # preload 97 over 290 pings -> linspace splits of 96/97/97 pings:
        # the 96-wide chunk needs one patch column fewer (stride 24), so C
        # churns across chunks alongside the seabed-driven R churn
        chunks = list(predict_reader(runner, reader, 97, save_labels=True))
        return chunks, seen

    dyn, dyn_shapes = run(False)
    sta, sta_shapes = run(True)

    # the fixture really exercises shape churn: the reference grid changes
    # height across chunks and width at the tail; static mode sees ONE shape
    assert len({r for r, _ in dyn_shapes}) > 1, dyn_shapes
    assert len({c for _, c in dyn_shapes}) > 1, dyn_shapes
    assert len(set(sta_shapes)) == 1, sta_shapes
    assert sta_shapes[0][0] == max(r for r, _ in dyn_shapes)
    assert sta_shapes[0][1] == max(c for _, c in dyn_shapes)

    assert len(dyn) == len(sta) == 3
    for k, ((s_d, e_d, p_d, l_d), (s_s, e_s, p_s, l_s)) in enumerate(
            zip(dyn, sta)):
        assert (s_d, e_d) == (s_s, e_s)
        np.testing.assert_array_equal(l_d, l_s)
        p_d, p_s = np.asarray(p_d), np.asarray(p_s)
        if mode == "patch" or dyn_shapes[k] == sta_shapes[0]:
            # patch mode: live patches read the same slab values whatever
            # the grid padding — BIT-identical.  (Slab chunks whose
            # reference grid already matches the fixed grid share the
            # same program, so they are bit-identical too.)
            np.testing.assert_array_equal(p_d, p_s)
            continue
        # slab mode with a padded grid: the fully-convolutional forward's
        # context at the per-chunk grid's bottom/right edge changes (zero
        # ROWS with bias propagation vs zero-PADDING at the array edge),
        # so kept pixels within ~RF of those edges move by f16-level
        # amounts; masks stay identical and the interior is exact
        np.testing.assert_array_equal(p_d == 0, p_s == 0)
        np.testing.assert_allclose(p_d, p_s, atol=2e-3)
        r_cut = dyn_shapes[k][0] * 24
        w = e_d - s_d
        interior = (slice(None), slice(0, max(r_cut - 40, 0)),
                    slice(0, max(w - 40, 0)))
        np.testing.assert_array_equal(p_d[interior], p_s[interior])
    assert any((np.asarray(p) != 0).any() for _, _, p, _ in dyn)


def test_static_grid_multi_reader_survey_one_program(tmp_path):
    """Memm surveys predict one file per echogram; static_grid must share
    ONE compiled grid shape across the WHOLE survey (run_save_predictions
    passes the survey-max fixed_R/fixed_C), not one per echogram — and the
    .npy outputs must be bit-identical to the per-chunk formulation.
    The echograms carry DIFFERENT range extents (n_range), so a
    per-reader min(R*sh, n_range) anywhere in the static path would
    re-specialize _mask_output per echogram height (review finding)."""
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.save_predict import run_save_predictions

    _, echs = _varying_seabed_survey(tmp_path, heights=(120, 84))
    assert len({e.shape[0] for e in echs}) == 2  # heights really differ

    class FakeData:
        def get_survey_readers(self, survey):
            return echs

    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4, "data_mode": "memm",
           "save_prediction_surveys": [2019], "resume_writing": False,
           "preload_n_pings": 97}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    def run(static):
        runner = GriddedRunner(model, v, dict(cfg, static_grid=static))
        seen, mask_sigs = [], []
        real = runner._predict_patches
        real_mask = runner._mask_output

        def spy(variables, data_slab, y0s, x0s, border_slab, meta_slab,
                consts, R, C, border_zero, use_meta=False):
            seen.append((R, C))
            return real(variables, data_slab, y0s, x0s, border_slab,
                        meta_slab, consts, R, C, border_zero, use_meta)

        def spy_mask(stitched, lab_bits, data_slab, sb_row,
                     nr, n_pings, zarr_pad, chunk_w):
            # the full static-arg + input-shape signature _mask_output
            # compiles against — every distinct tuple is one XLA compile
            mask_sigs.append((nr, n_pings, chunk_w, lab_bits.shape,
                              data_slab.shape))
            return real_mask(stitched, lab_bits, data_slab, sb_row,
                             nr, n_pings, zarr_pad, chunk_w)
        runner._predict_patches = spy
        runner._mask_output = spy_mask
        out_dir = tmp_path / f"pred_{static}"
        out_dir.mkdir()
        run_save_predictions(cfg, runner, FakeData(), str(out_dir))
        return out_dir, seen, mask_sigs

    dyn_dir, dyn_shapes, dyn_masks = run(False)
    sta_dir, sta_shapes, sta_masks = run(True)

    # per-chunk grids really churn across the two echograms (different
    # pinned seabeds AND different range extents); the static survey run
    # used EXACTLY one shape — the elementwise max over readers and chunks
    assert len(set(dyn_shapes)) > 1, dyn_shapes
    assert set(sta_shapes) == {(max(r for r, _ in dyn_shapes),
                               max(c for _, c in dyn_shapes))}, sta_shapes
    # ... and EXACTLY one _mask_output specialization: nr pinned to the
    # compiled grid height, not min'd with the per-echogram n_range
    assert len(set(dyn_masks)) > 1, dyn_masks
    assert len(set(sta_masks)) == 1, sta_masks

    outs = sorted(p.name for p in dyn_dir.iterdir())
    assert outs == sorted(p.name for p in sta_dir.iterdir())
    assert len(outs) == len(echs)
    got_nonzero = False
    for name in outs:
        a = np.load(dyn_dir / name)
        b = np.load(sta_dir / name)
        np.testing.assert_array_equal(a, b)
        got_nonzero |= bool((a != 0).any())
    assert got_nonzero


def test_static_grid_memmap_save_store(tmp_path):
    """static_grid on the memmap format (border-zero branch) through the
    full zarr writer: stores byte-compare equal."""
    import os

    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import \
        save_survey_predictions_zarr

    make_survey_dir(tmp_path / "m", year=2017, n_echograms=1, H=120, W=260,
                    seed=23)
    ech = get_echograms(years=[2017], path_to_echograms=str(tmp_path / "m"),
                        minimum_shape=32)[0]
    # seabed ramp: chunk 0 shallow, chunk 2 deep -> distinct grid heights
    np.save(os.path.join(ech.path, "seabed.npy"),
            np.linspace(25, 100, 260).astype(np.int64))
    ech = get_echograms(years=[2017], path_to_echograms=str(tmp_path / "m"),
                        minimum_shape=32)[0]

    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    stores = {}
    for static in (False, True):
        runner = GriddedRunner(model, v, dict(cfg, static_grid=static))
        out = tmp_path / f"pred_{static}"
        save_survey_predictions_zarr(runner, ech, str(out),
                                     preload_n_pings=100, save_labels=True)
        stores[static] = out

    from crimac_unet_tpu.data.zarrlite import ZGroup
    a = ZGroup.open(str(stores[False]))
    b = ZGroup.open(str(stores[True]))
    np.testing.assert_array_equal(a["annotation"][:], b["annotation"][:])
    np.testing.assert_array_equal(a["labels"][:], b["labels"][:])


# ------------------------------------------- transfer_dtype='uint8' serving
def test_quantize_db_u8_codes():
    """Quantization law: code = round((clip(dB, -75, 0) + 75) * 255/75);
    NaN/negative sv (no NaN in uint8) clamp to the -75 dB floor — matching
    the exact chain's scrub-to-zero for NaN (DIVERGENCES.md for the
    negative-sv case)."""
    from crimac_unet_tpu.pipeline.inference import _quantize_db_u8

    x = np.array([1e-3, 1.0, 0.0, np.nan, np.inf, -0.5, 1e-20],
                 np.float32)
    q = _quantize_db_u8(x)
    assert q.dtype == np.uint8
    # dB(1e-3) = -30 -> code 153; dB>=0 -> 255; 0/nan/INF/-ve/tiny ->
    # floor 0 (non-finite scrubs to 0 BEFORE the log, exactly like the
    # device chain's remove_nan_inf — +inf must not ride the clip to 0 dB)
    np.testing.assert_array_equal(q, [153, 255, 0, 0, 0, 0, 0])
    # dequant inverts to within half a step everywhere on finite inputs
    rng = np.random.default_rng(3)
    sv = rng.lognormal(np.log(1e-6), 3.0, size=4096).astype(np.float32)
    d_true = np.clip(10 * np.log10(sv + 1e-10), -75, 0)
    d_hat = _quantize_db_u8(sv).astype(np.float32) * (75 / 255) - 75
    assert np.abs(d_hat - d_true).max() <= 75 / 255 / 2 + 1e-4


def test_transfer_dtype_uint8_mode(tmp_path):
    """transfer_dtype='uint8' (serving): write masks and exported labels
    are IDENTICAL to the exact float32 transfer (the mask predicates ride
    as host-packed bits in both), and probabilities move only by the
    <=0.147 dB input quantization."""
    import os

    from crimac_unet_tpu.data.fixtures import (make_synthetic_echogram,
                                               write_memmap_echogram)
    from crimac_unet_tpu.data.memmap_reader import Echogram
    from crimac_unet_tpu.data.preprocess import echograms_to_zarr_survey
    from crimac_unet_tpu.models.unet import build_unet

    rng = np.random.RandomState(13)
    data, labels, heave, _ = make_synthetic_echogram(90, 130, rng)
    data[10:22, 30:55, :] = np.nan      # a dead-zone hole: sv_fin bits
    d = write_memmap_echogram(tmp_path / "memm",
                              "2019843-D20190512-T101010", data, labels,
                              heave)
    ech = Echogram(d)
    out = tmp_path / "zarr"
    echograms_to_zarr_survey([ech], str(out), "S2019843")
    reader = DataReaderZarr(str(out / "S2019843_sv.zarr"))

    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    def run(td):
        runner = GriddedRunner(model, v, dict(cfg, transfer_dtype=td))
        return list(predict_reader(runner, reader, 70, save_labels=True))

    exact, quant = run("float32"), run("uint8")
    assert len(exact) == len(quant) > 1
    saw_hole = False
    for (s, e, p, l), (s2, e2, p2, l2) in zip(exact, quant):
        assert (s, e) == (s2, e2)
        # identical write masks -> identical exported labels
        np.testing.assert_array_equal(l, l2)
        keep_zero = (p == 0)
        np.testing.assert_array_equal(keep_zero, p2 == 0)
        # the NaN hole is excluded from the write in both modes
        cols = np.arange(max(30, s), min(55, e)) - s
        if len(cols):
            assert (p[:, 10:22][:, :, cols] == 0).all()
            assert (p2[:, 10:22][:, :, cols] == 0).all()
            saw_hole = True
        # probabilities: only the <=0.147 dB input quantization moves them
        pd = np.abs(p.astype(np.float32) - p2.astype(np.float32))
        assert pd.max() < 0.15, pd.max()
        assert pd.mean() < 0.01, pd.mean()
    assert saw_hole
    # the mode rejects nothing else: meta/slab composition is exercised
    # in their own suites; bad dtypes fail loudly
    with pytest.raises(ValueError):
        GriddedRunner(model, v, dict(cfg, transfer_dtype="int8"))


def test_output_dtype_uint8(tmp_path):
    """output_dtype='uint8' (serving d2h quantization): stored values are
    float16(round(p * 255) / 255), the stored zero set only grows by
    kept pixels with p < 1/510 (codes rounding to 0), the exported labels
    (device keep mask, not `pred != 0`) are IDENTICAL, and the law holds
    in both infer modes."""
    from crimac_unet_tpu.data.fixtures import make_zarr_survey as _mks
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import _U8_PROB_DEQUANT

    sv = _mks(tmp_path, year=2018, n_echograms=1, H=70, W=140, seed=23,
              n_schools=3)
    reader = DataReaderZarr(sv)
    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4, "transfer_dtype": "float32"}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    for mode in ("patch", "slab"):
        def run(od):
            runner = GriddedRunner(model, v, dict(
                cfg, infer_mode=mode, output_dtype=od))
            return list(predict_reader(runner, reader, 60,
                                       save_labels=True))

        exact, quant = run("float16"), run("uint8")
        assert len(exact) == len(quant) > 1
        for (s, e, p, l), (s2, e2, p2, l2) in zip(exact, quant):
            assert (s2, e2) == (s, e)
            assert p2.dtype == np.float16
            # labels ride the device keep mask: identical under
            # output quantization
            np.testing.assert_array_equal(l, l2)
            # every stored value is on the 256-entry dequant lattice
            assert np.isin(p2, _U8_PROB_DEQUANT).all()
            # quantization law: |p - round(p*255)/255| <= 1/510 (+ f16
            # rounding of both representations)
            diff = np.abs(p.astype(np.float32) - p2.astype(np.float32))
            assert diff.max() <= 0.5 / 255 + 1e-3, diff.max()
            # zero set: masked pixels stay zero; it may only GROW, and
            # only by pixels whose probability rounds to code 0
            assert (p2[p == 0] == 0).all()
            extra = (p2 == 0) & (p != 0)
            if extra.any():
                assert p.astype(np.float32)[extra].max() < 0.5 / 255 + 1e-3

    with pytest.raises(ValueError):
        GriddedRunner(model, v, dict(cfg, output_dtype="int8"))


def test_keep_row_bound_is_superset_of_device_mask(tmp_path):
    """_keep_row_bound (the host-computed d2h crop bound) must bound the
    device write mask's last kept row on every chunk — the cropped rows
    are transferred as zeros, so an under-bound would silently drop kept
    pixels.  Exercised over fixtures with deep and shallow seabeds, both
    reader formats, and both seabed-band laws (zarr/memm)."""
    import jax
    import jax.numpy as jnp

    from crimac_unet_tpu.data.fixtures import make_survey_dir, \
        make_zarr_survey
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    readers = []
    sv = make_zarr_survey(tmp_path / "z", year=2019, n_echograms=1,
                          H=150, W=200, seed=5, n_schools=5)
    readers.append(DataReaderZarr(sv))
    make_survey_dir(tmp_path / "m", year=2017, n_echograms=1, H=150,
                    W=200, seed=6, n_schools=5)
    readers.append(get_echograms(years=[2017],
                                 path_to_echograms=str(tmp_path / "m"),
                                 minimum_shape=50)[0])

    import crimac_unet_tpu.pipeline.predict as P
    for reader in readers:
        runner = GriddedRunner(model, v, cfg)
        seen = []
        real = runner._mask_output

        def spy(stitched, lab_bits, data_slab, sb_row, nr, n_pings,
                zarr_pad, chunk_w):
            out, keep = real(stitched, lab_bits, data_slab, sb_row, nr,
                             n_pings, zarr_pad, chunk_w)
            seen.append(np.asarray(keep))
            return out, keep
        runner._mask_output = spy

        bounds = []
        real_bound = P._keep_row_bound

        def spy_bound(*a, **k):
            kr = real_bound(*a, **k)
            bounds.append(kr)
            return kr
        P._keep_row_bound = spy_bound
        try:
            for _ in predict_reader(runner, reader, 70):
                pass
        finally:
            P._keep_row_bound = real_bound
        assert len(seen) == len(bounds) and seen
        for keep, kr in zip(seen, bounds):
            rows = np.where(keep.any(axis=1))[0]
            last = int(rows[-1]) + 1 if len(rows) else 0
            assert last <= kr, (last, kr, reader.name)
            assert 0 < last  # the fixture must actually keep pixels
