"""School-level detection evaluation (pipeline/school_eval.py).

The reference's ``utils/coco_eval.py`` is dead code (imports a nonexistent
module, referenced by nothing — SURVEY.md §2); these tests pin the working
replacement: detection extraction, COCO greedy matching, 101-point AP
(hand-computed literals), and the survey-level CSV entry point on fixture
surveys.
"""

import numpy as np
import pytest

from crimac_unet_tpu.pipeline.school_eval import (
    DEFAULT_IOU_THRESHOLDS, average_precision, bbox_iou, detect_schools,
    match_detections, sandeel_gt_boxes, school_eval_survey, school_metrics)


# --------------------------------------------------------------- geometry
def test_bbox_iou_exact():
    a = [0, 9, 0, 9]          # 10x10 = 100 px
    assert bbox_iou(a, a) == 1.0
    assert bbox_iou(a, [20, 29, 0, 9]) == 0.0
    # touching at one row: rows 9..9 overlap -> 10 px inter, union 190
    assert bbox_iou(a, [9, 18, 0, 9]) == pytest.approx(10 / 190)
    # half overlap: [0..9]x[5..14] -> inter 50, union 150
    assert bbox_iou(a, [0, 9, 5, 14]) == pytest.approx(50 / 150)


def test_detect_schools_components_scores_min_area():
    prob = np.zeros((20, 30), np.float32)
    prob[2:5, 3:8] = 0.8          # blob A: 15 px, max 0.9 below
    prob[3, 4] = 0.9
    prob[10:12, 20:22] = 0.6      # blob B: 4 px
    prob[17, 28] = 0.95           # single-pixel speckle
    prob[0, 0] = np.nan           # NaN never fires
    dets = detect_schools(prob, prob_threshold=0.5, min_area=2)
    assert len(dets) == 2
    dets = sorted(dets, key=lambda d: d["bounding_box"][0])
    assert dets[0]["bounding_box"] == [2, 4, 3, 7]
    assert dets[0]["score"] == pytest.approx(0.9)
    assert dets[0]["n_pixels"] == 15
    assert dets[1]["bounding_box"] == [10, 11, 20, 21]
    assert dets[1]["score"] == pytest.approx(0.6)
    # min_area=1 keeps the speckle; threshold above it drops blob B
    assert len(detect_schools(prob, 0.5, min_area=1)) == 3
    assert len(detect_schools(prob, 0.85, min_area=1)) == 2


def test_detect_schools_4_connectivity_matches_gt_builder():
    # diagonal-only pixels are SEPARATE components (ndimage.label default
    # 4-connectivity — the convention objects_from_label_image builds the
    # ground truth with, data/mat_to_memmap.py:53)
    prob = np.zeros((4, 4), np.float32)
    prob[0, 0] = prob[1, 1] = 0.9
    assert len(detect_schools(prob, 0.5, min_area=1)) == 2


# --------------------------------------------------------------- matching
def test_match_detections_greedy_claims():
    gts = [[0, 9, 0, 9], [0, 9, 20, 29]]
    dets = [
        {"bounding_box": [0, 9, 0, 9], "score": 0.9},    # exact on gt0
        {"bounding_box": [0, 9, 1, 10], "score": 0.8},   # overlaps gt0 only
        {"bounding_box": [0, 9, 20, 29], "score": 0.7},  # exact on gt1
    ]
    scores, tp = match_detections(dets, gts, 0.5)
    assert scores.tolist() == [0.9, 0.8, 0.7]
    # det0 claims gt0; det1's IoU with gt0 is high but gt0 is taken -> FP
    assert tp.tolist() == [True, False, True]
    # strict threshold: only exact matches survive
    _, tp75 = match_detections(dets, gts, 0.99)
    assert tp75.tolist() == [True, False, True]


def test_match_detections_prefers_higher_iou():
    gts = [[0, 9, 0, 9], [0, 9, 6, 15]]
    # one detection overlapping both; must claim the higher-IoU gt1
    dets = [{"bounding_box": [0, 9, 6, 15], "score": 0.5}]
    _, tp = match_detections(dets, gts, 0.25)
    assert tp.tolist() == [True]
    # a second det then gets the remaining gt0
    dets.append({"bounding_box": [0, 9, 0, 9], "score": 0.4})
    _, tp = match_detections(dets, gts, 0.25)
    assert tp.tolist() == [True, True]


# --------------------------------------------------------------------- AP
def test_average_precision_hand_computed():
    # perfect ranking: AP = 1
    assert average_precision([0.9, 0.8], [True, True], 2) == 1.0
    # no detections, gt present: AP = 0
    assert average_precision([], [], 2) == 0.0
    # no ground truth: NaN (COCO skips the category)
    assert np.isnan(average_precision([0.9], [True], 0))
    # classic case: [TP, FP, TP] over 2 gts.
    # recall  = [.5, .5, 1.0]; precision = [1, .5, 2/3]; envelope=[1,2/3,2/3]
    # 101-pt: r<=0.5 (51 pts) -> 1.0; r>0.5 (50 pts) -> 2/3
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    got = average_precision([0.9, 0.8, 0.7], [True, False, True], 2)
    assert got == pytest.approx(expect)
    # ranking must be enforced internally: shuffled input, same AP
    got2 = average_precision([0.8, 0.7, 0.9], [False, True, True], 2)
    assert got2 == pytest.approx(expect)


def test_school_metrics_pools_across_readers():
    # reader 1: one gt, matched at 0.9; reader 2: one gt, FP at 0.95 + TP
    # at 0.5 -> global ranking [0.95 FP, 0.9 TP, 0.5 TP] over 2... 3 gts?
    r1 = ([{"bounding_box": [0, 4, 0, 4], "score": 0.9}],
          [[0, 4, 0, 4]])
    r2 = ([{"bounding_box": [50, 54, 0, 4], "score": 0.95},
           {"bounding_box": [0, 4, 0, 4], "score": 0.5}],
          [[0, 4, 0, 4]])
    m = school_metrics([r1, r2], iou_thresholds=(0.5,))
    assert m["n_gt"] == 2 and m["n_detections"] == 3
    # recall 2/2, precision 2/3 at the operating point
    assert m["recall"][0] == pytest.approx(1.0)
    assert m["precision"][0] == pytest.approx(2 / 3)
    # ranking: [FP(.95), TP(.9), TP(.5)] -> recall [0,.5,1],
    # precision [0,.5,2/3], envelope [2/3,2/3,2/3] -> AP = 2/3
    assert m["ap"][0] == pytest.approx(2 / 3)
    assert m["mean_ap"] == pytest.approx(2 / 3)


def test_school_metrics_no_gt_is_nan():
    m = school_metrics([([], [])])
    assert m["n_gt"] == 0
    assert all(np.isnan(a) for a in m["ap"])
    assert np.isnan(m["mean_ap"])


def test_detections_agree_with_gt_object_builder():
    """Property: on any binary mask, detect_schools finds exactly the
    components objects_from_label_image (the ground-truth builder,
    data/mat_to_memmap.py) would record — same boxes, same pixel counts.
    Detection and annotation share one component definition, so IoU=1
    self-matching is guaranteed for perfect predictions."""
    from crimac_unet_tpu.constants import RAW_SANDEEL
    from crimac_unet_tpu.data.mat_to_memmap import objects_from_label_image

    rng = np.random.RandomState(7)
    for trial in range(20):
        mask = rng.rand(40, 60) < rng.uniform(0.05, 0.45)
        dets = detect_schools(mask.astype(np.float32) * 0.9,
                              prob_threshold=0.5, min_area=1)
        objs = objects_from_label_image(
            np.where(mask, RAW_SANDEEL, 0).astype(np.int16))
        got = sorted((tuple(d["bounding_box"]), d["n_pixels"])
                     for d in dets)
        want = sorted((tuple(o["bounding_box"]), o["n_pixels"])
                      for o in objs)
        assert got == want, f"trial {trial}"


# ------------------------------------------------------- survey-level glue
@pytest.fixture(scope="module")
def memm_survey(tmp_path_factory):
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    path = tmp_path_factory.mktemp("memm")
    make_survey_dir(path, year=2017, n_echograms=1, H=100, W=240, seed=3)
    return str(path)


@pytest.fixture(scope="module")
def zarr_survey(tmp_path_factory):
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    path = tmp_path_factory.mktemp("zarr")
    return make_zarr_survey(path, year=2017, n_echograms=1, H=100, W=240,
                            seed=3)


def _mini_runner(depth=2, start_filts=4, patch=32, overlap=4):
    import jax
    import jax.numpy as jnp

    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import GriddedRunner

    config = {"patch_size": [patch, patch], "patch_overlap": overlap,
              "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
              "depth": depth, "start_filts": start_filts}
    model = build_unet(config)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, patch, patch, 4)), train=False)
    return GriddedRunner(model, variables, config)


def test_sandeel_gt_boxes_both_formats(memm_survey, zarr_survey):
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    echs = get_echograms(path_to_echograms=memm_survey, minimum_shape=50)
    boxes = sandeel_gt_boxes(echs[0])
    assert all(len(b) == 4 for b in boxes)
    assert all(b[0] <= b[1] and b[2] <= b[3] for b in boxes)
    # fixture surveys carry sandeel schools
    assert len(boxes) > 0

    zr = DataReaderZarr(zarr_survey)
    zboxes = sandeel_gt_boxes(zr)
    assert len(zboxes) > 0
    assert all(b[0] <= b[1] and b[2] <= b[3] for b in zboxes)


def test_school_eval_survey_end_to_end(tmp_path, zarr_survey):
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    runner = _mini_runner()
    reader = DataReaderZarr(zarr_survey)
    out_csv = tmp_path / "S_school_eval.csv"
    det_csv = tmp_path / "S_schools.csv"
    metrics = school_eval_survey(runner, [reader], preload_n_pings=64,
                                 prob_threshold=0.5, min_area=2,
                                 save_path_metrics=str(out_csv),
                                 save_path_detections=str(det_csv))
    # both categories evaluated from the one predict pass
    assert set(metrics["categories"]) == {"sandeel", "other"}
    sm = metrics["categories"]["sandeel"]
    assert sm["n_gt"] == len(sandeel_gt_boxes(reader))
    assert metrics["categories"]["other"]["n_gt"] > 0
    # a random-init net makes no accuracy promise — only contract checks
    for m in metrics["categories"].values():
        for key in ("recall", "precision", "ap"):
            assert len(m[key]) == len(DEFAULT_IOU_THRESHOLDS)

    import pandas as pd
    df = pd.read_csv(out_csv)
    # per category: |thresholds| rows + 1 summary; + 1 overall mAP row
    assert len(df) == 2 * (len(DEFAULT_IOU_THRESHOLDS) + 1) + 1
    assert {"category", "iou_threshold", "AP", "recall", "precision",
            "n_gt", "n_detections"} <= set(df.columns)
    assert set(df["category"]) == {"sandeel", "other", "mAP"}
    sand = df[df["category"] == "sandeel"]
    assert (sand["n_gt"] == sm["n_gt"]).all()

    # detection inventory CSV: one row per detection, objects-CSV naming
    # incl. physical coordinates (meters / ping_time)
    from crimac_unet_tpu.pipeline.school_eval import DETECTION_CSV_COLUMNS
    ddf = pd.read_csv(det_csv)
    n_dets = sum(m["n_detections"]
                 for m in metrics["categories"].values())
    assert len(ddf) == n_dets
    assert set(DETECTION_CSV_COLUMNS) <= set(ddf.columns)
    if len(ddf):
        assert (ddf["upperdepthindex"] <= ddf["lowerdepthindex"]).all()
        assert (ddf["reader"] == reader.name).all()
        rv = np.asarray(reader.range_vector)
        assert np.allclose(ddf["upperdepth"].values,
                           rv[ddf["upperdepthindex"].values])
        # zarr ping_time round-trips as ISO datetime strings
        assert ddf["startpingtime"].astype(str).str.startswith(
            "201").all()


def test_school_eval_perfect_predictions_give_ap_1(memm_survey):
    """An oracle that predicts exactly the (heave-reverted) label map must
    score AP=1 at every IoU threshold — pins detection->matching->AP."""
    from crimac_unet_tpu.constants import RAW_SANDEEL
    from crimac_unet_tpu.data.memmap_reader import get_echograms

    echs = get_echograms(path_to_echograms=memm_survey, minimum_shape=50)
    reader = echs[0]
    probs = (reader.label_numpy(heave=True) == RAW_SANDEEL).astype(
        np.float32) * 0.9
    per_reader = [(detect_schools(probs, 0.5, 1),
                   sandeel_gt_boxes(reader))]
    metrics = school_metrics(per_reader)
    assert metrics["n_gt"] > 0
    assert metrics["n_detections"] == metrics["n_gt"]
    for ap, rec in zip(metrics["ap"], metrics["recall"]):
        assert ap == pytest.approx(1.0)
        assert rec == pytest.approx(1.0)


def test_gt_boxes_live_in_heave_reverted_space(tmp_path):
    """With 1 m of heave (range step 0.18 m -> 6-px shift) the pickled
    `objects` sit in the ORIGINAL annotation space while predictions live
    in the sv / heave-reverted space; sandeel_gt_boxes must return the
    latter, so a perfect sv-space oracle still scores AP=1 (review
    finding: the pickled boxes scored AP=0 under real heave)."""
    from crimac_unet_tpu.constants import RAW_SANDEEL
    from crimac_unet_tpu.data.fixtures import (make_synthetic_echogram,
                                               write_memmap_echogram)
    from crimac_unet_tpu.data.memmap_reader import Echogram

    rng = np.random.RandomState(11)
    data, labels, _, _ = make_synthetic_echogram(90, 150, rng)
    heave = np.full(150, 1.0)
    name = "2017843-D20170427-T062615"
    write_memmap_echogram(tmp_path, name, data, labels, heave)
    reader = Echogram(str(tmp_path / name))

    gt = sandeel_gt_boxes(reader)
    pickled = [list(o["bounding_box"]) for o in reader.objects
               if o["fish_type_index"] == RAW_SANDEEL]
    assert gt and pickled
    # the shift is real: recomputed boxes differ from the pickled ones
    assert sorted(map(tuple, gt)) != sorted(map(tuple, pickled))
    shifts = {g[0] - p[0] for g, p in zip(sorted(map(tuple, gt)),
                                          sorted(map(tuple, pickled)))}
    assert shifts == {-6} or shifts == {6}, shifts

    probs = (reader.label_numpy(heave=True) == RAW_SANDEEL).astype(
        np.float32) * 0.9
    m = school_metrics([(detect_schools(probs, 0.5, 1), gt)])
    for ap in m["ap"]:
        assert ap == pytest.approx(1.0)
    # and against the pickled (unshifted) boxes the strict-IoU AP indeed
    # collapses — the scenario the fix exists for
    m_wrong = school_metrics([(detect_schools(probs, 0.5, 1), pickled)],
                             iou_thresholds=(0.75,))
    assert m_wrong["ap"][0] < 1.0


def test_streaming_detector_matches_dense():
    """Property: chunk-streamed components == dense components for any
    chunking, including components spanning several chunk borders."""
    from crimac_unet_tpu.pipeline.school_eval import StreamingDetector

    rng = np.random.RandomState(3)
    for trial in range(15):
        H, W = 30, rng.randint(40, 90)
        probs = np.where(rng.rand(H, W) < 0.35,
                         rng.uniform(0.5, 1.0, (H, W)), 0.0)
        probs[rng.rand(H, W) < 0.02] = np.nan
        dense = detect_schools(probs, 0.5, min_area=1)

        det = StreamingDetector(0.5, min_area=1)
        x = 0
        while x < W:
            w = min(int(rng.randint(1, 20)), W - x)
            det.add_chunk(probs[:, x:x + w], x)
            x += w
        streamed = det.finalize()
        key = lambda d: (tuple(d["bounding_box"]), d["n_pixels"],
                         round(d["score"], 6))
        assert sorted(map(key, streamed)) == sorted(map(key, dense)), \
            f"trial {trial}"

        # with random raw-file cuts: streamed-with-cuts == dense computed
        # per segment (cuts may land inside chunks or exactly on edges)
        from crimac_unet_tpu.pipeline.school_eval import _stream_cut_chunk
        n_cuts = rng.randint(1, 4)
        cuts = np.unique(rng.randint(1, W, n_cuts)).astype(np.int64)
        det = StreamingDetector(0.5, min_area=1)
        x = 0
        while x < W:
            w = min(int(rng.randint(1, 20)), W - x)
            _stream_cut_chunk(det, probs[:, x:x + w], x, x + w, cuts)
            x += w
        streamed_cut = det.finalize()
        dense_cut = []
        for s, e in zip(np.r_[0, cuts], np.r_[cuts, W]):
            for d in detect_schools(probs[:, s:e], 0.5, min_area=1):
                b = d["bounding_box"]
                dense_cut.append(dict(d, bounding_box=[
                    b[0], b[1], b[2] + int(s), b[3] + int(s)]))
        assert sorted(map(key, streamed_cut)) \
            == sorted(map(key, dense_cut)), f"trial {trial} (cuts)"


def test_streaming_detector_boundary_and_contiguity():
    from crimac_unet_tpu.pipeline.school_eval import StreamingDetector

    row = np.zeros((5, 4), np.float32)
    row[2, :] = 0.9  # a horizontal line through every chunk
    # merged across the border -> ONE detection
    det = StreamingDetector(0.5)
    det.add_chunk(row, 0)
    det.add_chunk(row, 4)
    out = det.finalize()
    assert len(out) == 1 and out[0]["bounding_box"] == [2, 2, 0, 7]
    assert out[0]["n_pixels"] == 8
    # reset_boundary (raw-file cut) -> TWO detections
    det = StreamingDetector(0.5)
    det.add_chunk(row, 0)
    det.reset_boundary()
    det.add_chunk(row, 4)
    assert len(det.finalize()) == 2
    # non-contiguous chunks without a reset raise
    det = StreamingDetector(0.5)
    det.add_chunk(row, 0)
    with pytest.raises(ValueError):
        det.add_chunk(row, 5)


def test_detect_reader_schools_cuts_at_raw_file_boundaries(monkeypatch):
    """Zarr GT objects are per raw file; a detection spanning the file
    boundary must be split before matching."""
    import crimac_unet_tpu.pipeline.school_eval as SE

    class StubReader:
        raw_file = np.array(["a"] * 6 + ["b"] * 6)

    probs = np.zeros((4, 12), np.float32)
    probs[1, 2:10] = 0.8  # one component crossing the a|b boundary at 6

    def fake_predict_reader(runner, reader, preload, progress=False,
                            fixed_R=None, fixed_C=None):
        # two chunks of 6 pings, boundary exactly at a chunk edge is the
        # EASY case — use uneven chunks so the cut lands mid-chunk
        yield 0, 5, np.stack([probs[:, :5], probs[:, :5]]), None
        yield 5, 12, np.stack([probs[:, 5:], probs[:, 5:]]), None

    monkeypatch.setattr(SE, "predict_reader", fake_predict_reader,
                        raising=False)
    # patch the symbol the function imports lazily
    import crimac_unet_tpu.pipeline.inference as INF
    monkeypatch.setattr(INF, "predict_reader", fake_predict_reader)
    dets = SE.detect_reader_schools(None, StubReader())
    boxes = sorted(d["bounding_box"] for d in dets[0])
    assert boxes == [[1, 1, 2, 5], [1, 1, 6, 9]]
    # channel 1 ('other') streamed the same chunks in the same pass
    assert sorted(d["bounding_box"] for d in dets[1]) == boxes


def test_cut_on_chunk_edge_still_splits():
    """Regression (review finding): a raw-file cut landing exactly on a
    chunk's first ping must still break connectivity — the interior-only
    filter silently merged schools whenever a file boundary coincided
    with the 1000-ping chunk grid."""
    from crimac_unet_tpu.pipeline.school_eval import (StreamingDetector,
                                                      _stream_cut_chunk)

    probs = np.zeros((4, 12), np.float32)
    probs[1, 2:10] = 0.8  # one component crossing the boundary at 6
    cuts = np.array([6], dtype=np.int64)
    det = StreamingDetector(0.5)
    # chunked exactly at the cut: [0,6) then [6,12)
    _stream_cut_chunk(det, probs[:, :6], 0, 6, cuts)
    _stream_cut_chunk(det, probs[:, 6:], 6, 12, cuts)
    boxes = sorted(d["bounding_box"] for d in det.finalize())
    assert boxes == [[1, 1, 2, 5], [1, 1, 6, 9]]


def test_lazy_matching_equals_dense_matrix():
    """The candidate-prefiltered matcher (no dense D x G matrix) must be
    decision-identical to matching against the precomputed matrix."""
    from crimac_unet_tpu.pipeline.school_eval import bbox_iou_matrix

    rng = np.random.RandomState(5)
    for trial in range(20):
        def boxes(n):
            y0 = rng.randint(0, 40, n)
            x0 = rng.randint(0, 60, n)
            return np.stack([y0, y0 + rng.randint(0, 8, n),
                             x0, x0 + rng.randint(0, 8, n)], axis=1)
        gts = boxes(rng.randint(1, 12)).tolist()
        dets = [{"bounding_box": b.tolist(),
                 "score": float(rng.rand())}
                for b in boxes(rng.randint(1, 20))]
        mat = bbox_iou_matrix(
            np.asarray([d["bounding_box"] for d in dets]),
            np.asarray(gts))
        for thr in (0.1, 0.25, 0.5):
            s1, t1 = match_detections(dets, gts, thr)
            s2, t2 = match_detections(dets, gts, thr, iou_matrix=mat)
            assert s1.tolist() == s2.tolist()
            assert t1.tolist() == t2.tolist(), f"trial {trial} thr {thr}"


def test_gt_boxes_by_category_single_pass(memm_survey):
    from crimac_unet_tpu.constants import RAW_OTHER, RAW_SANDEEL
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.pipeline.school_eval import (gt_boxes,
                                                      gt_boxes_by_category)

    reader = get_echograms(path_to_echograms=memm_survey,
                           minimum_shape=50)[0]
    both = gt_boxes_by_category(reader, [RAW_SANDEEL, RAW_OTHER])
    assert sorted(map(tuple, both[RAW_SANDEEL])) == \
        sorted(map(tuple, gt_boxes(reader, RAW_SANDEEL)))
    assert sorted(map(tuple, both[RAW_OTHER])) == \
        sorted(map(tuple, gt_boxes(reader, RAW_OTHER)))
    assert both[RAW_SANDEEL] and both[RAW_OTHER]


def test_detect_store_schools_matches_live(tmp_path, zarr_survey,
                                           memm_survey):
    """Detections from an already-written prediction store must equal the
    live-predict detections — the stored values ARE the live chunks."""
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.inference import (
        save_reader_predictions_memm, save_survey_predictions_zarr)
    from crimac_unet_tpu.pipeline.school_eval import (
        detect_reader_schools, detect_store_schools)

    runner = _mini_runner()
    key = lambda d: (tuple(d["bounding_box"]), d["n_pixels"], d["score"])

    # zarr store path
    reader = DataReaderZarr(zarr_survey)
    store = tmp_path / (reader.name + "_pred.zarr")
    save_survey_predictions_zarr(runner, reader, str(store),
                                 preload_n_pings=64)
    live = detect_reader_schools(runner, reader, preload_n_pings=64,
                                 prob_threshold=0.2)
    stored = detect_store_schools(str(store), reader, prob_threshold=0.2)
    for ch in (0, 1):
        assert sorted(map(key, stored[ch])) == sorted(map(key, live[ch]))

    # memm .npy path
    ech = get_echograms(path_to_echograms=memm_survey,
                        minimum_shape=50)[0]
    npy = tmp_path / (ech.name + "_pred.npy")
    save_reader_predictions_memm(runner, ech, str(npy),
                                 preload_n_pings=64)
    live = detect_reader_schools(runner, ech, preload_n_pings=64,
                                 prob_threshold=0.2)
    stored = detect_store_schools(str(npy), ech, prob_threshold=0.2)
    for ch in (0, 1):
        assert sorted(map(key, stored[ch])) == sorted(map(key, live[ch]))

    # survey glue consumes the same directory (from_predictions mode,
    # no runner needed)
    m = school_eval_survey(None, [ech], prob_threshold=0.2,
                           from_predictions=str(tmp_path))
    assert set(m["categories"]) == {"sandeel", "other"}
    with pytest.raises(FileNotFoundError):
        school_eval_survey(None, [reader], from_predictions=str(
            tmp_path / "nowhere"))


def test_multifile_zarr_and_static_grid_equivalence(tmp_path):
    """Live vs store detections on a REAL two-raw-file zarr survey (the
    raw_file boundary exercises the connectivity cut on both paths), and
    the static_grid multi-reader branch (survey-max fixed_R/fixed_C)
    yields the same detections as per-reader grids on memm surveys."""
    from crimac_unet_tpu.data.fixtures import (make_survey_dir,
                                               make_zarr_survey)
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.inference import (
        save_survey_predictions_zarr)
    from crimac_unet_tpu.pipeline.school_eval import (
        detect_reader_schools, detect_store_schools, school_eval_survey)

    key = lambda d: (tuple(d["bounding_box"]), d["n_pixels"], d["score"])
    runner = _mini_runner()

    sv = make_zarr_survey(tmp_path, year=2018, n_echograms=2, H=90,
                          W=140, seed=9)
    reader = DataReaderZarr(sv)
    assert len(np.unique(np.asarray(reader.raw_file))) == 2
    store = tmp_path / (reader.name + "_pred.zarr")
    save_survey_predictions_zarr(runner, reader, str(store),
                                 preload_n_pings=60)
    live = detect_reader_schools(runner, reader, preload_n_pings=60,
                                 prob_threshold=0.2)
    stored = detect_store_schools(str(store), reader, prob_threshold=0.2,
                                  chunk_pings=90)  # DIFFERENT chunking
    for ch in (0, 1):
        assert sorted(map(key, stored[ch])) == sorted(map(key, live[ch]))

    # static_grid multi-reader branch: two memm echograms with differing
    # extents share one compiled program; detections identical
    memm = tmp_path / "memm"
    make_survey_dir(memm, year=2017, n_echograms=2, H=90, W=150, seed=4)
    readers = get_echograms(path_to_echograms=str(memm),
                            minimum_shape=50)
    assert len(readers) == 2
    base = school_eval_survey(runner, readers, preload_n_pings=60,
                              prob_threshold=0.2)
    srunner = _mini_runner()
    srunner.static_grid = True
    static = school_eval_survey(srunner, readers, preload_n_pings=60,
                                prob_threshold=0.2)
    for cname in base["categories"]:
        b, s = base["categories"][cname], static["categories"][cname]
        assert b["n_detections"] == s["n_detections"], cname
        assert b["ap"] == s["ap"], cname
        assert b["recall"] == s["recall"], cname


def test_visualize_school_detections(tmp_path, memm_survey):
    from crimac_unet_tpu.constants import RAW_SANDEEL
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.utils.plotting import visualize_school_detections

    reader = get_echograms(path_to_echograms=memm_survey,
                           minimum_shape=50)[0]
    probs = (reader.label_numpy(heave=True) == RAW_SANDEEL).astype(
        np.float32) * 0.9
    dets = detect_schools(probs, 0.5, 1)
    out = tmp_path / "schools.png"
    visualize_school_detections(reader, dets, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_checkpoint_run_id_fallbacks():
    from crimac_unet_tpu.pipeline.cli_common import checkpoint_run_id

    assert checkpoint_run_id("saved/exp/20260101_1200/best.msgpack") \
        == "20260101_1200"
    assert checkpoint_run_id("best.msgpack") == "best"
    assert checkpoint_run_id("/best.msgpack") == "best"


def test_ap_band_large_fixture(tmp_path):
    """AP regression gate on a statistically meaningful fixture (>= 50
    ground-truth schools PER CATEGORY; VERDICT r3 #4 — the 7-school demo
    fixture quantized AP to 1/7-recall steps).  Deterministic degraded
    predictions — every 7th school dropped, detection scores spread over
    a fixed ladder, plus off-school false positives — must land in a
    fixed AP/recall band, so the matcher/AP math cannot silently rot.
    No model or device involved: the prediction store is constructed."""
    import numpy as np

    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.school_eval import (
        detect_store_schools, gt_boxes_by_category, school_metrics)

    # school sizes scale with each echogram's W, so many SMALL echograms
    # (not one wide one) is what yields many distinct components
    sv = make_zarr_survey(tmp_path, year=2019, n_echograms=14, H=400,
                          W=400, seed=77, n_schools=12)
    reader = DataReaderZarr(sv)
    n_pings, n_range = reader.shape
    gt = gt_boxes_by_category(reader, [27, 1])
    counts = {c: len(v) for c, v in gt.items()}
    assert min(counts.values()) >= 50, counts  # recall resolution <= 1/50

    prob = np.zeros((2, n_range, n_pings), np.float32)
    expected_missed = {}
    for ch, cat in ((0, 27), (1, 1)):
        boxes = sorted(map(tuple, gt[cat]))
        missed = 0
        for i, (y0, y1, x0, x1) in enumerate(boxes):
            if i % 7 == 3:          # deterministic misses (~1/7)
                missed += 1
                continue
            score = 0.55 + 0.4 * ((i * 37) % 10) / 10.0
            region = prob[ch, y0:y1 + 1, x0:x1 + 1]
            np.maximum(region, score, out=region)  # overlap: max score
        expected_missed[cat] = missed
        # deterministic false positives in provably empty spots
        fp = 0
        for k in range(40):
            y, x = 3, 40 + 97 * k
            if x + 24 >= n_pings:
                break
            if (prob[ch, y:y + 9, x:x + 24] == 0).all():
                prob[ch, y:y + 9, x:x + 24] = 0.62
                fp += 1
            if fp >= 10:
                break
        assert fp >= 5  # the FP arm must actually exercise precision

    npy = tmp_path / (reader.name + "_pred.npy")
    np.save(npy, prob.astype(np.float16))
    dets = detect_store_schools(str(npy), reader, prob_threshold=0.5)

    for ch, cat, name in ((0, 27, "sandeel"), (1, 1, "other")):
        m = school_metrics([(dets[ch], gt[cat])])
        n_gt = m["n_gt"]
        assert n_gt == counts[cat] >= 50
        painted_frac = 1.0 - expected_missed[cat] / n_gt
        for t_i, thr in enumerate(m["iou_thresholds"]):
            # painted boxes reproduce GT bboxes exactly (IoU 1 unless two
            # schools merge into one component), so every threshold sees
            # the same band: recall ~ painted fraction minus merge losses,
            # AP below 1 (misses + mid-ranked false positives) but well
            # above the FP-dominated floor
            assert 0.60 <= m["recall"][t_i] <= painted_frac + 1e-9, \
                (name, thr, m["recall"])
            assert 0.55 <= m["ap"][t_i] <= 0.97, (name, thr, m["ap"])
        # misses + FPs must actually register: AP strictly below perfect
        assert m["ap"][0] < 0.95


def test_merge_detections():
    """Box-merge post-processing (r5, VERDICT r4 #4): detections whose
    boxes come within merge_gap pixels merge into one (union box, max
    score, summed pixels); farther ones stay; gap=0 is the identity."""
    from crimac_unet_tpu.pipeline.school_eval import merge_detections
    dets = [
        {"bounding_box": [0, 4, 0, 4], "score": 0.9, "n_pixels": 10},
        {"bounding_box": [2, 6, 8, 12], "score": 0.7, "n_pixels": 5},
        {"bounding_box": [50, 60, 50, 60], "score": 0.5, "n_pixels": 7},
    ]
    assert merge_detections(dets, 0) == dets
    got = merge_detections(dets, 8)   # gap 3 in x between first two
    got = sorted(got, key=lambda d: d["bounding_box"][0])
    assert len(got) == 2
    assert got[0] == {"bounding_box": [0, 6, 0, 12], "score": 0.9,
                      "n_pixels": 15}
    assert got[1]["bounding_box"] == [50, 60, 50, 60]
    # transitive chains merge through the middle box
    chain = [
        {"bounding_box": [0, 2, 0, 2], "score": 0.1, "n_pixels": 1},
        {"bounding_box": [0, 2, 5, 7], "score": 0.2, "n_pixels": 1},
        {"bounding_box": [0, 2, 10, 12], "score": 0.3, "n_pixels": 1},
    ]
    merged = merge_detections(chain, 4)
    assert len(merged) == 1
    assert merged[0]["bounding_box"] == [0, 2, 0, 12]
    assert merged[0]["score"] == 0.3 and merged[0]["n_pixels"] == 3
    # y-separation must NOT merge even when x-ranges overlap
    far_y = [
        {"bounding_box": [0, 2, 0, 4], "score": 0.1, "n_pixels": 1},
        {"bounding_box": [20, 22, 0, 4], "score": 0.2, "n_pixels": 1},
    ]
    assert len(merge_detections(far_y, 4)) == 2


def test_postprocessed_path_band(tmp_path):
    """Gate on the PER-CATEGORY post-processed path (r5 adopted
    operating point, VERDICT r4 #4): schools painted as FRAGMENTS
    (three pieces with 3-px gaps) plus sub-min_area speckle.  Through
    school_eval_survey with the production dict knobs
    (min_area={'sandeel': 9, 'other': 64}, merge_gap={'sandeel': 8,
    'other': 0}): sandeel fragments must consolidate (detection count
    near GT, AP in a high band) while 'other' — whose fragments sit
    farther apart than its merge_gap=0 allows — stays fragmented, and
    speckle dies at min_area in both."""
    import numpy as np

    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.school_eval import (
        gt_boxes_by_category, school_eval_survey)

    sv = make_zarr_survey(tmp_path, year=2019, n_echograms=14, H=400,
                          W=400, seed=77, n_schools=12)
    reader = DataReaderZarr(sv)
    n_pings, n_range = reader.shape
    gt = gt_boxes_by_category(reader, [27, 1])

    prob = np.zeros((2, n_range, n_pings), np.float32)
    for ch, cat in ((0, 27), (1, 1)):
        for i, (y0, y1, x0, x1) in enumerate(sorted(map(tuple, gt[cat]))):
            score = 0.55 + 0.4 * ((i * 37) % 10) / 10.0
            # three ping-axis fragments with 3-px gaps (< sandeel's
            # merge_gap 8 -> consolidates; 'other' gap=0 -> stays split)
            w = x1 - x0 + 1
            cuts = [x0, x0 + max(w // 3, 1), x0 + max(2 * w // 3, 2)]
            for k, cs in enumerate(cuts):
                ce = (cuts[k + 1] - 3) if k + 1 < len(cuts) else x1
                if ce >= cs:
                    region = prob[ch, y0:y1 + 1, cs:ce + 1]
                    np.maximum(region, score, out=region)
        # speckle: 2x2 blobs (area 4 < both min_areas) in empty spots
        sp = 0
        for k in range(60):
            y, x = 5, 30 + 61 * k
            if x + 2 >= n_pings:
                break
            if (prob[ch, y:y + 2, x:x + 2] == 0).all():
                prob[ch, y:y + 2, x:x + 2] = 0.7
                sp += 1
        assert sp >= 10

    npy = tmp_path / (reader.name + "_pred.npy")
    np.save(npy, prob.astype(np.float16))

    m = school_eval_survey(None, [reader], prob_threshold=0.5,
                           min_area={"sandeel": 9, "other": 64},
                           merge_gap={"sandeel": 8, "other": 0},
                           from_predictions=str(tmp_path))
    sand = m["categories"]["sandeel"]
    oth = m["categories"]["other"]
    # sandeel: fragments merged + speckle killed -> detections near GT,
    # high AP at IoU .25 (merged unions cover the GT boxes)
    assert sand["n_detections"] <= 1.5 * sand["n_gt"], sand
    # 0.65 floor: a few GT schools sit within merge_gap of each other
    # and union into one detection (measured 0.74 on this fixture)
    assert sand["ap"][0] >= 0.65, sand["ap"]
    # other: no merging -> fragment over-count survives, and per-fragment
    # IoU vs full GT boxes is low -> AP@.25 collapses vs sandeel's
    assert oth["n_detections"] >= 2 * oth["n_gt"], oth
    # 1/3-width fragments still clear IoU .25 (~0.38 measured) but can
    # never reach IoU .5 — while merged sandeel stays high there
    assert oth["ap"][0] <= 0.45, oth["ap"]
    assert oth["ap"][1] == 0.0, oth["ap"]
    assert sand["ap"][1] >= 0.5, sand["ap"]


def test_partial_min_area_dict_keeps_uncovered_category(tmp_path):
    """A per-category min_area dict that does NOT cover every category
    must not pre-filter the uncovered ones at the covered minimum: the
    detector floor drops to the uncovered default of 1."""
    import numpy as np

    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.pipeline.school_eval import school_eval_survey

    sv = make_zarr_survey(tmp_path, year=2019, n_echograms=2, H=200,
                          W=200, seed=3, n_schools=4)
    reader = DataReaderZarr(sv)
    n_pings, n_range = reader.shape
    prob = np.zeros((2, n_range, n_pings), np.float32)
    # one 2x2 (area 4) blob per channel
    prob[0, 10:12, 10:12] = 0.9
    prob[1, 30:32, 30:32] = 0.9
    npy = tmp_path / (reader.name + "_pred.npy")
    np.save(npy, prob.astype(np.float16))

    m = school_eval_survey(None, [reader],
                           min_area={"sandeel": 9},  # 'other' uncovered
                           from_predictions=str(tmp_path))
    # sandeel blob (area 4 < 9) filtered; other blob (default 1) kept
    assert m["categories"]["sandeel"]["n_detections"] == 0
    assert m["categories"]["other"]["n_detections"] == 1
