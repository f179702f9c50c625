"""School-level detection evaluation (working COCO-style evaluator).

The reference ships ``crimac_unet/utils/coco_eval.py`` — a vendored
torchvision COCO detection evaluator — but it imports a nonexistent
``utils`` module and no entry point references it (SURVEY.md §2
"Vestigial: COCO eval"); pixel PR/F1 is the only quality metric that
actually runs there.  Surveys are *consumed* school-by-school, so this
module implements what that dead file intended: detection-style scoring of
whole sandeel schools, as a working entry point.

Protocol (COCO-style, self-contained — no pycocotools):

- **Detections**: connected components of the thresholded sandeel
  probability map (``scipy.ndimage.label``, default 4-connectivity — the
  same convention the ground-truth objects are built with,
  data/mat_to_memmap.py:53 / reference generate_memmap_files.py:128-156),
  each scored by its maximum probability.
- **Matching**: per reader and IoU threshold, detections sorted by
  descending score greedily claim the highest-IoU unmatched ground-truth
  box (the COCO matching rule).
- **AP**: detections pooled over all readers of a survey, ranked globally
  by score; 101-point interpolated average precision per IoU threshold
  (the COCO definition), plus recall/precision at the operating point.

Boxes are inclusive ``[y0, y1, x0, x1]`` in (range, ping) index space —
the convention of ``Echogram.object_bounding_boxes`` and
``DataReaderZarr.objects`` (reference data_reader.py:84-113,637-697).

CLI::

    python -m crimac_unet_tpu.pipeline.school_eval --yaml_path ... \
        --checkpoint_path ... --save_path_metrics ...

writes ``<survey>_school_eval.csv`` per evaluation survey (one row per IoU
threshold + a mean-AP summary row).
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

from ..constants import RAW_SANDEEL

# COCO evaluates AP at IoU .5:.95; echogram school boxes are small and
# ragged (single-digit pixel heights are common), where a one-pixel shift
# moves IoU a lot — include a loose 0.25 operating point alongside the
# COCO-standard 0.5/0.75.
DEFAULT_IOU_THRESHOLDS = (0.25, 0.5, 0.75)


# --------------------------------------------------------------- geometry
def bbox_iou(a, b) -> float:
    """IoU of two inclusive [y0, y1, x0, x1] boxes."""
    ay0, ay1, ax0, ax1 = a
    by0, by1, bx0, bx1 = b
    ih = min(ay1, by1) - max(ay0, by0) + 1
    iw = min(ax1, bx1) - max(ax0, bx0) + 1
    if ih <= 0 or iw <= 0:
        return 0.0
    inter = ih * iw
    area_a = (ay1 - ay0 + 1) * (ax1 - ax0 + 1)
    area_b = (by1 - by0 + 1) * (bx1 - bx0 + 1)
    return inter / float(area_a + area_b - inter)


def detect_schools(prob_map: np.ndarray, prob_threshold: float = 0.5,
                   min_area: int = 1) -> list:
    """Connected components of ``prob_map >= prob_threshold`` as detection
    dicts ``{bounding_box, score, n_pixels}``.

    ``prob_map`` is (n_range, n_pings); NaNs never fire.  ``min_area``
    drops single-pixel speckle (in *pixels*, not bbox area).
    """
    from scipy import ndimage

    prob_map = np.asarray(prob_map, dtype=np.float32)
    mask = np.isfinite(prob_map) & (prob_map >= prob_threshold)
    labeled, n = ndimage.label(mask)
    detections = []
    if n == 0:
        return detections
    slices = ndimage.find_objects(labeled)
    for i in range(1, n + 1):
        sl = slices[i - 1]
        component = labeled[sl] == i
        n_pixels = int(component.sum())
        if n_pixels < min_area:
            continue
        ys, xs = np.nonzero(component)
        detections.append({
            "bounding_box": [int(ys.min()) + sl[0].start,
                             int(ys.max()) + sl[0].start,
                             int(xs.min()) + sl[1].start,
                             int(xs.max()) + sl[1].start],
            "score": float(prob_map[sl][component].max()),
            "n_pixels": n_pixels,
        })
    return detections


# --------------------------------------------------------------- matching
def match_detections(detections: list, gt_boxes, iou_threshold: float):
    """COCO greedy matching for one reader at one IoU threshold.

    Returns ``(scores, tp)`` — detection scores in descending order and a
    parallel bool array marking which matched a ground-truth box.  Each GT
    box is claimed at most once, by the highest-scoring detection whose
    IoU with it clears the threshold (ties on IoU go to the earlier GT,
    like pycocotools).
    """
    order = np.argsort([-d["score"] for d in detections], kind="stable")
    scores = np.array([detections[i]["score"] for i in order],
                      dtype=np.float64)
    tp = np.zeros(len(order), dtype=bool)
    claimed = np.zeros(len(gt_boxes), dtype=bool)
    for row, di in enumerate(order):
        best_iou, best_gt = -1.0, -1
        for gi, gt in enumerate(gt_boxes):
            if claimed[gi]:
                continue
            iou = bbox_iou(detections[di]["bounding_box"], gt)
            if iou >= iou_threshold and iou > best_iou:
                best_iou, best_gt = iou, gi
        if best_gt >= 0:
            claimed[best_gt] = True
            tp[row] = True
    return scores, tp


def average_precision(scores, tp, n_gt: int) -> float:
    """101-point interpolated AP (the COCO definition) from pooled,
    *globally re-ranked* detection scores and their TP flags.

    NaN when there is no ground truth (COCO skips such categories)."""
    if n_gt <= 0:
        return float("nan")
    scores = np.asarray(scores, dtype=np.float64)
    tp = np.asarray(tp, dtype=bool)
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # precision envelope (monotone non-increasing from the right), then
    # sample at 101 evenly spaced recall points
    envelope = np.maximum.accumulate(precision[::-1])[::-1]
    ap = 0.0
    for r in np.linspace(0.0, 1.0, 101):
        idx = np.searchsorted(recall, r, side="left")
        ap += envelope[idx] if idx < len(envelope) else 0.0
    return float(ap / 101.0)


def school_metrics(per_reader: list,
                   iou_thresholds=DEFAULT_IOU_THRESHOLDS) -> dict:
    """Pool per-reader ``(detections, gt_boxes)`` pairs into survey-level
    detection metrics.

    Matching runs per reader (boxes from different echograms never
    overlap); ranking for AP is global across readers, exactly like COCO
    pools per-image matches into one category curve.
    """
    out = {"iou_thresholds": list(iou_thresholds),
           "n_gt": int(sum(len(g) for _, g in per_reader)),
           "n_detections": int(sum(len(d) for d, _ in per_reader))}
    aps, recalls, precisions = [], [], []
    for thr in iou_thresholds:
        all_scores, all_tp = [], []
        for detections, gt_boxes in per_reader:
            scores, tp = match_detections(detections, gt_boxes, thr)
            all_scores.append(scores)
            all_tp.append(tp)
        scores = np.concatenate(all_scores) if all_scores else \
            np.zeros(0)
        tp = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
        n_tp = int(tp.sum())
        aps.append(average_precision(scores, tp, out["n_gt"]))
        recalls.append(n_tp / out["n_gt"] if out["n_gt"] else float("nan"))
        precisions.append(n_tp / len(tp) if len(tp) else float("nan"))
    out["ap"] = aps
    out["recall"] = recalls
    out["precision"] = precisions
    finite = [a for a in aps if np.isfinite(a)]
    out["mean_ap"] = float(np.mean(finite)) if finite else float("nan")
    return out


# ------------------------------------------------------------ survey glue
def sandeel_gt_boxes(reader) -> list:
    """Inclusive sandeel-school boxes for one reader, either format."""
    if getattr(reader, "data_format", "memm") == "zarr":
        return [o["bounding_box"] for o in reader.objects
                if o["fish_type_index"] == RAW_SANDEEL]
    return [list(o["bounding_box"]) for o in reader.objects
            if o["fish_type_index"] == RAW_SANDEEL]


def assemble_sandeel_probs(runner, reader, preload_n_pings=1000,
                           progress=False) -> np.ndarray:
    """Full-survey (n_range, n_pings) sandeel probability map via the
    chunked predict pipeline (channel 0 of predict_reader's output —
    pixels outside the write mask are 0, like the reference's out array,
    save_predict.py:41-65)."""
    from .inference import predict_reader

    if reader.data_format == "zarr":
        n_pings, n_range = reader.shape
    else:
        n_range, n_pings = reader.shape
    out = np.zeros((n_range, n_pings), dtype=np.float32)
    for start, end, pred, _ in predict_reader(runner, reader,
                                              preload_n_pings,
                                              progress=progress):
        out[:, start:end] = np.asarray(pred[0], dtype=np.float32)
    return out


def school_eval_survey(runner, readers, preload_n_pings=1000,
                       prob_threshold=0.5, min_area=2,
                       iou_thresholds=DEFAULT_IOU_THRESHOLDS,
                       save_path_metrics=None, progress=False) -> dict:
    """Survey-level school detection metrics over all its readers."""
    per_reader = []
    for reader in readers:
        probs = assemble_sandeel_probs(runner, reader, preload_n_pings,
                                       progress=progress)
        detections = detect_schools(probs, prob_threshold, min_area)
        per_reader.append((detections, sandeel_gt_boxes(reader)))
    metrics = school_metrics(per_reader, iou_thresholds)
    metrics["prob_threshold"] = prob_threshold
    metrics["min_area"] = min_area
    if save_path_metrics is not None:
        save_school_metrics(metrics, save_path_metrics)
    return metrics


def save_school_metrics(metrics: dict, save_path) -> None:
    """CSV: one row per IoU threshold + a summary row (mean AP over
    thresholds, the COCO headline form)."""
    import pandas as pd

    rows = [{"iou_threshold": t, "AP": metrics["ap"][i],
             "recall": metrics["recall"][i],
             "precision": metrics["precision"][i],
             "n_gt": metrics["n_gt"],
             "n_detections": metrics["n_detections"],
             "prob_threshold": metrics.get("prob_threshold", np.nan),
             "min_area": metrics.get("min_area", np.nan)}
            for i, t in enumerate(metrics["iou_thresholds"])]
    rows.append({"iou_threshold": np.nan, "AP": metrics["mean_ap"],
                 "recall": np.nan, "precision": np.nan,
                 "n_gt": metrics["n_gt"],
                 "n_detections": metrics["n_detections"],
                 "prob_threshold": metrics.get("prob_threshold", np.nan),
                 "min_area": metrics.get("min_area", np.nan)})
    pd.DataFrame(rows).to_csv(save_path)


def main(argv=None):
    from ..config import (get_argparse_parser, load_yaml_config,
                          parse_config_options)
    from ..data.partition import make_partition
    from ..models.unet import build_unet
    from ..utils.general import fix_seeds
    from .engine import load_checkpoint
    from .inference import GriddedRunner

    args = get_argparse_parser("eval").parse_args(argv)
    configuration = load_yaml_config(args.yaml_path)
    config = parse_config_options(configuration, args)
    experiment_name = Path(config["yaml_path"]).stem

    fix_seeds(config["random_seed"])

    payload = load_checkpoint(config["checkpoint_path"])
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = build_unet(config)
    runner = GriddedRunner(model, variables, config)

    print(f'\nLoading {config["data_mode"]} data partition object...')
    start = time.time()
    data_obj = make_partition(config)
    print("Executed time for loading data partition object (min):"
          f" {np.round((time.time() - start) / 60, 2)}")

    parts = os.path.normpath(str(config["checkpoint_path"])).split(
        os.path.sep)
    run_id = parts[-2] if len(parts) >= 2 and parts[-2] else \
        os.path.splitext(parts[-1])[0]
    metrics_dir = os.path.join(str(config["save_path_metrics"]),
                               experiment_name, run_id)
    os.makedirs(metrics_dir, exist_ok=True)
    print("Metrics directory:", metrics_dir)

    # knobs are YAML keys (school_prob_threshold / school_min_area /
    # school_iou_thresholds), not CLI flags: the eval flag set stays the
    # reference's (utils/general.py:38-117)
    prob_thr = float(config.get("school_prob_threshold", 0.5))
    min_area = int(config.get("school_min_area", 2))
    iou_thrs = tuple(config.get("school_iou_thresholds",
                                DEFAULT_IOU_THRESHOLDS))

    for survey in data_obj.get_evaluation_surveys():
        readers = data_obj.get_survey_readers(survey)
        print("Running school detection evaluation for", survey)
        metrics = school_eval_survey(
            runner, readers,
            preload_n_pings=int(config.get("preload_n_pings", 1000)),
            prob_threshold=prob_thr, min_area=min_area,
            iou_thresholds=iou_thrs,
            save_path_metrics=os.path.join(
                metrics_dir, f"{survey}_school_eval.csv"),
            progress=True)
        ap_str = ", ".join(f"AP@{t:g}={a:.3f}" for t, a in
                           zip(metrics["iou_thresholds"], metrics["ap"]))
        print(f"{survey}: mean AP {metrics['mean_ap']:.3f} ({ap_str}), "
              f"{metrics['n_detections']} detections / "
              f"{metrics['n_gt']} schools")


if __name__ == "__main__":
    main()
