"""Eval-path parity: evaluate_reader's streaming histogram PR curve must
match the reference per-patch pipeline + sklearn on the same model."""

import numpy as np
import pytest
from sklearn.metrics import precision_recall_curve

import jax
import jax.numpy as jnp

from crimac_unet_tpu.constants import (LABEL_BOUNDARY_VAL, LABEL_IGNORE_VAL,
                                       LABEL_OVERLAP_VAL,
                                       LABEL_SEABED_MASK_VAL, SANDEEL)
from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import UNet
from crimac_unet_tpu.ops import metrics
from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                evaluate_reader,
                                                _build_keep_mask)
from test_inference_parity import (_oracle_convert_unused, _oracle_refine,
                                   _oracle_mask_seabed, _oracle_mask_overlap)

WH = WW = 32
OVERLAP = 4


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("evalparity")
    sv = make_zarr_survey(path, year=2017, n_echograms=1, H=60, W=160,
                          seed=21, n_schools=5, unused_species=True)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, WH, WW, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), x, train=False)
    config = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
              "frequencies": [18, 38, 120, 200], "fwd_batch": 8}
    runner = GriddedRunner(model, variables, config)

    def forward_single(patch_chw):
        out = model.apply(variables, jnp.asarray(
            patch_chw.transpose(1, 2, 0))[None], train=False)
        return np.asarray(jax.nn.softmax(out, axis=-1))[0]

    return reader, runner, forward_single


def _oracle_eval(reader, forward_single, frequencies, eval_mode="all",
                 extend_size=20):
    """Reference evaluate path (evaluate.py:39-79 + pipeline.py:242-341)."""
    n_pings, n_range = reader.shape
    sb = np.asarray(reader.get_seabed(0, n_pings))
    end_range = int(min(sb.max() + 50, n_range))

    ys_c = np.arange(0 - (OVERLAP + 1), end_range - (OVERLAP + 1),
                     WH - 2 * OVERLAP) + WH // 2
    xs_c = np.arange(0 - (OVERLAP + 1), n_pings - (OVERLAP + 1),
                     WW - 2 * OVERLAP) + WW // 2

    keep = None
    P = WH + WW  # padded keep frame: reference masks out-of-survey pixels
    if eval_mode in ("region", "trace"):
        keep = _build_keep_mask(reader, eval_mode, extend_size, n_range,
                                n_pings, pad=P)

    all_preds, all_labels = [], []
    for yc in ys_c:
        for xc in xs_c:
            # get_crop_zarr (dataset.py:358-407): clipped read + pad +
            # nan scrub for BOTH data and labels
            data = np.zeros((len(frequencies), WH, WW))
            labels = np.full((WH, WW), float(LABEL_BOUNDARY_VAL))
            y0, x0 = yc - WH // 2 + 1, xc - WW // 2 + 1
            cy0, cx0 = max(y0, 0), max(x0, 0)
            cy1 = min(y0 + WH, n_range)
            cx1 = min(x0 + WW, n_pings)
            if cy1 > cy0 and cx1 > cx0:
                d = reader.get_data_slice(cx0, cx1 - cx0, cy0, cy1 - cy0,
                                          frequencies)
                l = reader.get_label_slice(cx0, cx1 - cx0, cy0, cy1 - cy0)
                data[:, cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0] = \
                    np.nan_to_num(d.swapaxes(1, 2), nan=0.0)
                labels[cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0] = \
                    np.nan_to_num(l.T, nan=LABEL_BOUNDARY_VAL)

            lab = _oracle_convert_unused(labels)
            lab = _oracle_refine(data, lab)
            lab = _oracle_mask_seabed(lab, reader, [yc, xc])
            lab = _oracle_mask_overlap(lab, OVERLAP)
            if keep is not None:
                kp = keep[y0 + P:y0 + WH + P, x0 + P:x0 + WW + P]
                lab = np.where(kp > 0, lab, -1)

            # data transform (zarr eval: no border zero, evaluate.py:47)
            lab[~np.isfinite(data[0])] = LABEL_IGNORE_VAL
            d = np.where(np.isfinite(data), data, 0.0)
            d = np.clip(10 * np.log10(d + 1e-10), -75, 0)

            probs = forward_single(d.astype(np.float32))
            all_preds.append(probs[:, :, SANDEEL].ravel().astype(np.float16))
            all_labels.append(lab.ravel().astype(np.int8))

    preds = np.hstack(all_preds)
    labels = np.hstack(all_labels).astype(np.int32)

    # validate_model_testing filtering (pipeline.py:343-357)
    preds = preds.copy()
    preds[labels == LABEL_SEABED_MASK_VAL] = 0
    lab = labels.copy()
    for v in (-70, -30, -100, -10):
        lab[labels == v] = -100
    lab[labels == -50] = 0
    sel = lab != -100
    return lab[sel], preds[sel]


@pytest.mark.parametrize("eval_mode", ["all", "region", "trace"])
def test_eval_histogram_matches_sklearn_oracle(setup, eval_mode):
    """Label-chain/filter parity is exact (same pixel counts per class);
    the PR curve may shift by one float16 ulp per score because batched and
    single-sample conv execution differ in the last f32 bits, so the curve
    comparison allows a tiny F1/AP tolerance."""
    reader, runner, forward_single = setup

    hist = np.asarray(evaluate_reader(runner, reader, metrics.new_histogram(),
                                      eval_mode=eval_mode, chunk_cols=3))
    got = metrics.pr_curve_from_histogram(hist)

    labels, preds = _oracle_eval(reader, forward_single, runner.frequencies,
                                 eval_mode)
    # exact parity of the valid-pixel selection and class split
    assert hist.sum() == len(labels)
    assert hist[0].sum() == int((labels == SANDEEL).sum())

    prec, rec, thr = precision_recall_curve(labels, preds,
                                            pos_label=SANDEEL)
    numerator = 2 * rec * prec
    denom = rec + prec
    f1 = np.divide(numerator, denom, out=np.zeros_like(denom),
                   where=denom != 0)
    assert abs(metrics.max_f1(got)[0] - f1.max()) < 2e-3
    # curve shape: average precision must agree closely
    ap_got = -np.sum(np.diff(got["recall"]) * got["precision"][:-1])
    ap_want = -np.sum(np.diff(rec) * prec[:-1])
    assert abs(ap_got - ap_want) < 2e-3


def test_keep_mask_is_bool(setup):
    """The dense survey-size keep mask is the eval path's one big host
    allocation; bool keeps a 50k-ping survey at ~50 MB instead of ~200 MB
    (VERDICT r2 #8)."""
    reader, _, _ = setup
    n_pings, n_range = reader.shape
    keep = _build_keep_mask(reader, "region", 20, n_range, n_pings)
    assert keep.dtype == np.bool_
    assert keep.any()


def test_keep_mask_matches_reference_crop_semantics_randomized():
    """Property check of the padded keep-mask frame against a direct
    per-crop recreation of the reference's extend_label_masks semantics
    (crop origin center - shape//2 WITHOUT the +1 of the data crops;
    painting clamped to the CROP, not the survey) over random surveys,
    geometries and bboxes — generalizes the single-fixture parity of
    test_reference_parity beyond one geometry."""
    from crimac_unet_tpu.ops.patches import grid_dims
    from crimac_unet_tpu.pipeline.inference import _build_keep_mask

    rng = np.random.RandomState(77)
    for trial in range(40):
        n_range = rng.randint(40, 140)
        n_pings = rng.randint(60, 220)
        o = rng.randint(2, 9)
        wh = ww = int(rng.choice([24, 32, 48])) + 2 * o
        extend = rng.randint(0, 25)
        mode = ["region", "trace"][trial % 2]
        n_box = rng.randint(1, 6)
        bboxes = []
        for _ in range(n_box):
            y0 = rng.randint(0, n_range)
            x0 = rng.randint(0, n_pings)
            bboxes.append([y0, y0 + rng.randint(1, 30),
                           x0, x0 + rng.randint(1, 30)])
        bboxes = np.array(bboxes, int)

        class FakeReader:
            def get_object_bounding_boxes(self):
                return bboxes.copy()

        sh = sw = wh - 2 * o
        R = grid_dims(0, n_range, wh, o)
        C = grid_dims(0, n_pings, ww, o)
        pr = max(o, R * sh + o - n_range, 0)
        pc = max(o, C * sw + o - n_pings, 0)
        keep = _build_keep_mask(FakeReader(), mode, extend, n_range,
                                n_pings, pad=(pr, pc))

        # extended bboxes the reference paints (extend_label_masks.py
        # :71-80): region extends rows; trace covers [0, n_range)
        ext = bboxes.copy()
        if mode == "region":
            ext[:, 0] -= extend
            ext[:, 1] += extend
        else:
            ext[:, 0] = 0
            ext[:, 1] = n_range
        ext[:, 2] -= extend
        ext[:, 3] += extend

        for r in range(R):
            for c in range(C):
                # reference crop origin (no +1); data origin has the +1
                yc = r * sh - (o + 1) + wh // 2
                xc = c * sw - (o + 1) + ww // 2
                yul, xul = yc - wh // 2, xc - ww // 2
                ref = np.zeros((wh, ww), bool)
                for (b0, b1, a0, a1) in ext:
                    # the reference's overlap() pre-check
                    # (extend_label_masks.py:22-30, called at :89) — it
                    # also guards the paint slices against negative
                    # stops, so it is load-bearing for semantics
                    dy = min(b1, yul + wh) - max(b0, yul)
                    dx = min(a1, xul + ww) - max(a0, xul)
                    if dy < 0 or dx < 0:
                        continue
                    ref[max(b0 - yul, 0):min(b1 - yul, wh),
                        max(a0 - xul, 0):min(a1 - xul, ww)] = True
                y0d, x0d = yul + 1, xul + 1  # data-crop origin (+1)
                ours = keep[y0d + pr:y0d + wh + pr,
                            x0d + pc:x0d + ww + pc]
                np.testing.assert_array_equal(
                    ours, ref, err_msg=f"trial {trial} mode {mode} "
                    f"patch ({r},{c}) geom {(n_range, n_pings, wh, o)}")


@pytest.mark.parametrize("eval_mode", ["all", "region", "fish"])
def test_static_grid_multi_reader_eval_exact(tmp_path, eval_mode):
    """static_grid pads every reader's eval grid to the survey-max height
    (ONE compiled program for a multi-echogram survey); pad-row patches
    are force-ignored, so the PR curve is EXACTLY the per-reader one."""
    from test_inference_parity import _varying_seabed_survey

    from crimac_unet_tpu.pipeline.evaluate import evaluate_survey

    _, echs = _varying_seabed_survey(tmp_path)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    v = model.init(jax.random.PRNGKey(11), jnp.zeros((1, WH, WW, 4)),
                   train=False)
    cfg = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8}

    def run(static):
        runner = GriddedRunner(model, v, dict(cfg, static_grid=static))
        shapes = []
        real = runner._eval_patches

        def spy(variables, hist, data_slab, *rest, **kw):
            shapes.append(tuple(np.shape(data_slab)))
            return real(variables, hist, data_slab, *rest, **kw)
        runner._eval_patches = spy
        curve = evaluate_survey(runner, echs, eval_mode)
        return curve, shapes

    dyn_curve, dyn_shapes = run(False)
    sta_curve, sta_shapes = run(True)

    # the two echograms' reference grids really differ in height; the
    # static run used ONE shape — the full pinned grid height (dynamic
    # slabs are cropped to their data-bearing rows and re-padded on
    # device, so static height >= every dynamic height)
    assert len(set(dyn_shapes)) > 1, dyn_shapes
    assert len(set(sta_shapes)) == 1, sta_shapes
    assert sta_shapes[0][0] >= max(h for h, _, _ in dyn_shapes), \
        (sta_shapes, dyn_shapes)

    assert sorted(dyn_curve.keys()) == sorted(sta_curve.keys())
    for k in dyn_curve:
        np.testing.assert_array_equal(np.asarray(dyn_curve[k]),
                                      np.asarray(sta_curve[k]))


# --------------------------------------- transfer_dtype-quantized evaluation
@pytest.mark.parametrize("td", ["bfloat16", "uint8"])
def test_eval_quantized_transfer_label_chain_bit_exact(setup, td):
    """Under a quantized h2d transfer (bfloat16/uint8) the eval label chain
    must stay BIT-IDENTICAL to float32: the refine threshold predicate is
    computed on the host from the exact float32 sv and rides as a bool slab
    (thr_slab).  Proof: with a constant-output model (all params zeroed ->
    uniform softmax) the PR histogram is a pure function of the label
    chain — so bit-equal histograms across transfer dtypes mean bit-equal
    labels at every scored pixel."""
    reader, _, _ = setup
    cfg = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    v = model.init(jax.random.PRNGKey(7),
                   jnp.zeros((1, WH, WW, 4), jnp.float32), train=False)
    # zero every parameter (keep the BN stats): the head's kernel AND bias
    # are zero, so logits == 0 -> softmax == 1/3 at every pixel regardless
    # of the input
    zeroed = dict(v, params=jax.tree_util.tree_map(jnp.zeros_like,
                                                   v["params"]))

    def hist_for(dtype):
        r = GriddedRunner(model, zeroed, dict(cfg, transfer_dtype=dtype))
        return np.asarray(evaluate_reader(
            r, reader, metrics.new_histogram(), eval_mode="all",
            chunk_cols=3))

    h_exact = hist_for("float32")
    h_quant = hist_for(td)
    assert h_exact.sum() > 0
    np.testing.assert_array_equal(h_exact, h_quant)


@pytest.mark.parametrize("td", ["bfloat16", "uint8"])
def test_eval_quantized_transfer_metric_bound(setup, td):
    """With a real (random-init) model, quantized transfers keep the exact
    valid-pixel selection/class split (label chain unchanged) and move the
    PR metrics only through the bounded input perturbation
    (<=0.02 dB bf16 / <=0.147 dB uint8)."""
    reader, _, _ = setup
    cfg = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    v = model.init(jax.random.PRNGKey(5),
                   jnp.zeros((1, WH, WW, 4), jnp.float32), train=False)

    def curve_for(dtype):
        r = GriddedRunner(model, v, dict(cfg, transfer_dtype=dtype))
        h = np.asarray(evaluate_reader(
            r, reader, metrics.new_histogram(), eval_mode="all",
            chunk_cols=3))
        return h, metrics.max_f1(metrics.pr_curve_from_histogram(h))[0]

    h32, f32_f1 = curve_for("float32")
    hq, q_f1 = curve_for(td)
    # label-chain invariants are exact: same scored-pixel count and the
    # same positive-class split
    assert hq.sum() == h32.sum()
    assert hq[0].sum() == h32[0].sum()
    # the quantized network input moves F1 only within the measured-bound
    # envelope (test fixture is tiny; keep a generous but meaningful cap)
    assert abs(q_f1 - f32_f1) < 0.02, (q_f1, f32_f1)


def test_host_label_convert_matches_device_op():
    """_convert_labels_host (quantized-transfer eval ships pre-converted
    int8 labels) must equal ops.label_ops.convert_label_indexing with
    mark_unused_species=True on every input class, including NaN (which
    the device path never sees converted: zarr slabs are nan_to_num'd to
    BOUNDARY first — host maps NaN to IGNORE, the same value)."""
    from crimac_unet_tpu.ops import label_ops
    from crimac_unet_tpu.pipeline.inference import _convert_labels_host

    rng = np.random.default_rng(11)
    # fractional codes included: the device path truncates via
    # astype(int32) BEFORE comparing (27.5 -> SANDEEL, 0.5/-0.5 ->
    # BACKGROUND), and the host must mirror that truncation exactly
    raw = rng.choice([0.0, 27.0, 1.0, 6009.0, 5027.0, -100.0, -50.0,
                      2.5, 27.5, 0.5, -0.5, 1.9],
                     size=(3, 40, 50)).astype(np.float32)
    got = _convert_labels_host(raw)
    assert got.dtype == np.int8
    want = np.asarray(label_ops.convert_label_indexing(
        jnp.asarray(raw.astype(np.int32)), mark_unused_species=True))
    np.testing.assert_array_equal(got.astype(np.int32), want)
    # NaN -> IGNORE (== what BOUNDARY-filled zarr slabs would carry)
    nan_in = np.array([[np.nan, 27.0]], np.float32)
    np.testing.assert_array_equal(_convert_labels_host(nan_in),
                                  [[LABEL_IGNORE_VAL, 1]])
